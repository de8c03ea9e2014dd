#!/usr/bin/env python
"""Hypothesis: Mosaic miscompiles the wide lane-broadcast DIVIDE (p / lsum).

Variant A (micro): tiny kernel doing x / y[:, :1] broadcast on the failing shape.
Variant B (postnorm): full group-attend with normalization moved AFTER the
value matmul — dot(p, v2) / lsum — no wide divide anywhere.
"""
import _pathfix  # noqa: F401

import functools
import math
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from tailored_avsr_tpu.ops.masking import MASK_MIN
from test_group_attend import make_case, ref_group_attend


# ---------------- micro divide-broadcast probe ----------------
def _div_kernel(x_ref, y_ref, out_ref):
    out_ref[...] = x_ref[...] / y_ref[...][:, :1]


def micro_divide():
    rng = np.random.RandomState(3)
    for rows, lanes in [(10, 1040), (10, 104), (4, 16)]:
        x = jnp.asarray(rng.rand(rows, lanes) + 0.5, jnp.float32)
        y = jnp.asarray(rng.rand(rows, lanes) + 0.5, jnp.float32)
        got = pl.pallas_call(
            _div_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        )(x, y)
        want = np.asarray(x) / np.asarray(y)[:, :1]
        err = np.max(np.abs(np.asarray(got) - want))
        print(f"micro divide ({rows},{lanes}): err={err:.2e}", flush=True)


# ---------------- post-normalized group attend ----------------
def _kernel_postnorm(pos_ref, q_ref, knew_ref, vnew_ref, anc_ref, k_ref,
                     v_ref, out_ref, *, scale):
    _, hb, km, lc, dk = k_ref.shape
    anc = anc_ref[0]
    tt = jax.lax.broadcasted_iota(jnp.int32, (km, lc), 1)
    live = tt < pos_ref[0] - 1
    valid_i = jnp.concatenate(
        [((anc == j) & live).astype(jnp.int32) for j in range(km)], axis=1)
    valid = valid_i > 0
    valid_f = valid_i.astype(jnp.float32)
    for hi in range(hb):
        q = q_ref[0, hi]
        k2 = k_ref[0, hi].reshape(km * lc, dk)
        s = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(valid, s, MASK_MIN)
        s_new = jnp.sum(
            q.astype(jnp.float32) * knew_ref[0, hi].astype(jnp.float32),
            axis=1, keepdims=True) * scale
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_new)
        p = jnp.exp(s - m) * valid_f
        p_new = jnp.exp(s_new - m)
        lsum = jnp.sum(p, axis=1, keepdims=True) + p_new
        v2 = v_ref[0, hi].reshape(km * lc, dk)
        o_un = jax.lax.dot_general(
            p.astype(v_ref.dtype), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_un = o_un + p_new * vnew_ref[0, hi].astype(jnp.float32)
        out_ref[0, hi] = (o_un / lsum).astype(out_ref.dtype)


def run_postnorm(k, v, q, k_new, v_new, anc, pos):
    b, h, km, lc, dk = k.shape
    scale = 1.0 / math.sqrt(dk)
    hb = h
    row3 = lambda i, j, pos_ref: (i, 0, 0)
    row = lambda i, j, pos_ref: (i, j, 0, 0)
    row5 = lambda i, j, pos_ref: (i, j, 0, 0, 0)
    return pl.pallas_call(
        functools.partial(_kernel_postnorm, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hb),
            in_specs=[
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, km, lc), row3),
                pl.BlockSpec((1, hb, km, lc, dk), row5),
                pl.BlockSpec((1, hb, km, lc, dk), row5),
            ],
            out_specs=pl.BlockSpec((1, hb, km, dk), row),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, km, dk), v.dtype),
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, k_new, v_new, anc, k, v)


def main():
    micro_divide()
    rng = np.random.RandomState(0)
    cases = [
        (jnp.float32, 1e-4, (2, 3, 4, 16, 64), 9),
        (jnp.bfloat16, 0.05, (2, 4, 10, 104, 64), 52),
        (jnp.bfloat16, 0.05, (2, 8, 10, 104, 64), 90),
    ]
    for dtype, tol, (b, h, km, lc, dk), pos in cases:
        kk, vv, qq, kn, vn, anc = make_case(rng, b, h, km, lc, dk, pos, dtype=dtype)
        got = np.asarray(run_postnorm(kk, vv, qq, kn, vn, anc, pos), np.float64)
        want = ref_group_attend(kk, vv, qq, kn, vn, anc, pos)
        err = np.max(np.abs(got - want) / (np.abs(want) + 1e-3))
        ok = "OK " if err < tol else "BAD"
        print(f"postnorm   {dtype.__name__:8s} ({b},{h},{km},{lc},{dk}) "
              f"pos={pos}: {ok} relerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
