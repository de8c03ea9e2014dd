#!/usr/bin/env python
"""Test candidate fixes for the compiled group-attend value-matmul miscompile."""
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


def _kernel(pos_ref, q_ref, knew_ref, vnew_ref, anc_ref, k_ref, v_ref,
            out_ref, *, scale, variant):
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
        if variant == "f32dot":
            w = p / lsum  # stay f32
            v2 = v_ref[0, hi].reshape(km * lc, dk).astype(jnp.float32)
            o = jax.lax.dot_general(
                w, v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "perj":
            w = (p / lsum).astype(v_ref.dtype)
            o = jnp.zeros((km, dk), jnp.float32)
            for j in range(km):
                wj = w[:, j * lc:(j + 1) * lc]  # (K, Lc)
                o = o + jax.lax.dot_general(
                    wj, v_ref[0, hi, j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        elif variant == "perj_f32":
            w = p / lsum
            o = jnp.zeros((km, dk), jnp.float32)
            for j in range(km):
                wj = w[:, j * lc:(j + 1) * lc]
                o = o + jax.lax.dot_general(
                    wj, v_ref[0, hi, j].astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:
            raise ValueError(variant)
        o = o + (p_new / lsum) * vnew_ref[0, hi].astype(jnp.float32)
        out_ref[0, hi] = o.astype(out_ref.dtype)


def run(k, v, q, k_new, v_new, anc, pos, variant):
    b, h, km, lc, dk = k.shape
    scale = 1.0 / math.sqrt(dk)
    hb = h
    row3 = lambda i, j, pos_ref: (i, 0, 0)
    row = lambda i, j, pos_ref: (i, j, 0, 0)
    row5 = lambda i, j, pos_ref: (i, j, 0, 0, 0)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, variant=variant),
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
    rng = np.random.RandomState(0)
    cases = [
        (jnp.bfloat16, 0.05, (2, 4, 10, 104, 64), 52),
        (jnp.bfloat16, 0.05, (2, 8, 10, 104, 64), 90),
        (jnp.float32, 1e-4, (1, 2, 3, 8, 64), 1),
    ]
    for variant in ["f32dot", "perj", "perj_f32"]:
        for dtype, tol, (b, h, km, lc, dk), pos in cases:
            kk, vv, qq, kn, vn, anc = make_case(
                rng, b, h, km, lc, dk, pos, dtype=dtype)
            got = np.asarray(run(kk, vv, qq, kn, vn, anc, pos, variant),
                             np.float64)
            want = ref_group_attend(kk, vv, qq, kn, vn, anc, pos)
            err = np.max(np.abs(got - want) / (np.abs(want) + 1e-3))
            ok = "OK " if err < tol else "BAD"
            print(f"{variant:10s} {dtype.__name__:8s} "
                  f"({b},{h},{km},{lc},{dk}) pos={pos}: {ok} relerr={err:.2e}",
                  flush=True)




def _kernel_noconcat(pos_ref, q_ref, knew_ref, vnew_ref, anc_ref, k_ref,
                     v_ref, out_ref, *, scale):
    """Per-slot formulation: every tensor stays (K, Lc); no concatenated or
    lane-sliced 1040-wide layouts anywhere."""
    _, hb, km, lc, dk = k_ref.shape
    anc = anc_ref[0]
    tt = jax.lax.broadcasted_iota(jnp.int32, (km, lc), 1)
    live = tt < pos_ref[0] - 1
    valid_f = [((anc == j) & live).astype(jnp.float32) for j in range(km)]
    for hi in range(hb):
        q = q_ref[0, hi]  # (K, dk)
        s_new = jnp.sum(
            q.astype(jnp.float32) * knew_ref[0, hi].astype(jnp.float32),
            axis=1, keepdims=True) * scale  # (K, 1)
        s_js = []
        m = s_new
        for j in range(km):
            sj = jax.lax.dot_general(
                q, k_ref[0, hi, j], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (K, Lc)
            sj = sj * valid_f[j] + MASK_MIN * (1.0 - valid_f[j])
            s_js.append(sj)
            m = jnp.maximum(m, jnp.max(sj, axis=1, keepdims=True))
        p_new = jnp.exp(s_new - m)
        lsum = p_new
        p_js = []
        for j in range(km):
            pj = jnp.exp(s_js[j] - m) * valid_f[j]
            p_js.append(pj)
            lsum = lsum + jnp.sum(pj, axis=1, keepdims=True)
        o = (p_new / lsum) * vnew_ref[0, hi].astype(jnp.float32)
        for j in range(km):
            wj = (p_js[j] / lsum).astype(v_ref.dtype)
            o = o + jax.lax.dot_general(
                wj, v_ref[0, hi, j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0, hi] = o.astype(out_ref.dtype)


def run_noconcat(k, v, q, k_new, v_new, anc, pos):
    b, h, km, lc, dk = k.shape
    scale = 1.0 / math.sqrt(dk)
    hb = h
    row3 = lambda i, j, pos_ref: (i, 0, 0)
    row = lambda i, j, pos_ref: (i, j, 0, 0)
    row5 = lambda i, j, pos_ref: (i, j, 0, 0, 0)
    return pl.pallas_call(
        functools.partial(_kernel_noconcat, scale=scale),
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


def main_noconcat():
    rng = np.random.RandomState(0)
    cases = [
        (jnp.bfloat16, 0.05, (2, 4, 10, 104, 64), 52),
        (jnp.bfloat16, 0.05, (2, 8, 10, 104, 64), 90),
        (jnp.float32, 1e-4, (1, 2, 3, 8, 64), 1),
        (jnp.float32, 1e-4, (2, 3, 4, 16, 64), 9),
    ]
    for dtype, tol, (b, h, km, lc, dk), pos in cases:
        kk, vv, qq, kn, vn, anc = make_case(rng, b, h, km, lc, dk, pos, dtype=dtype)
        got = np.asarray(run_noconcat(kk, vv, qq, kn, vn, anc, pos), np.float64)
        want = ref_group_attend(kk, vv, qq, kn, vn, anc, pos)
        err = np.max(np.abs(got - want) / (np.abs(want) + 1e-3))
        ok = "OK " if err < tol else "BAD"
        print(f"noconcat   {dtype.__name__:8s} ({b},{h},{km},{lc},{dk}) "
              f"pos={pos}: {ok} relerr={err:.2e}", flush=True)


if __name__ == "__main__":
    import sys as _s
    main_noconcat() if "--noconcat" in _s.argv else main()
