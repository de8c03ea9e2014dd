#!/usr/bin/env python
"""Discriminate WHERE the group-attend value-matmul miscompile happens.

Facts so far (measurements/r4/ga_*.log): block reads exact; masked logits,
running max, and the normalizer all exact; yet dot(w, v) is wrong in every
formulation (wide, per-slot, f32, postnorm, hb=1) whenever the live cache is
non-empty. Hypothesis: the vreg->MXU relayout of the IN-KERNEL-COMPUTED w is
miscompiled; reductions (lsum) read the correct vregs, and the first matmul's
operands come straight from VMEM refs, which is why only this dot breaks.

Experiments at the failing f32 shape (2,3,4,16,64) pos=9 and the flagship
bf16 shape:
  injected : w computed on HOST, passed in as an input ref -> dot (pure matmul)
  scratch  : w computed in-kernel, stored to a VMEM scratch ref, read back,
             then dot (forces a materialization between VPU and MXU)
  pdump    : dump the in-kernel p matrix itself and compare to the oracle
             (s/m/lsum were checked before; p itself never was)
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


# ---------------- injected-w pure matmul ----------------
def _inj_kernel(w_ref, v_ref, out_ref):
    _, hb, km, lcm, dk = v_ref.shape  # v passed pre-reshaped (1,H,K*Lc treated)
    for hi in range(hb):
        w = w_ref[0, hi]  # (K, K*Lc)
        v2 = v_ref[0, hi].reshape(km * lcm, dk)
        out_ref[0, hi] = jax.lax.dot_general(
            w, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def run_injected(w, v):
    b, h, km, lc, dk = v.shape
    row = lambda i: (i, 0, 0, 0)
    row5 = lambda i: (i, 0, 0, 0, 0)
    return pl.pallas_call(
        _inj_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, km, km * lc), row),
            pl.BlockSpec((1, h, km, lc, dk), row5),
        ],
        out_specs=pl.BlockSpec((1, h, km, dk), row),
        out_shape=jax.ShapeDtypeStruct((b, h, km, dk), jnp.float32),
    )(w, v)


# ---------------- scratch-materialized w ----------------
def _scr_kernel(pos_ref, q_ref, knew_ref, vnew_ref, anc_ref, k_ref, v_ref,
                out_ref, w_scr, *, scale):
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
        w_scr[...] = (p / lsum).astype(w_scr.dtype)  # materialize
        w = w_scr[...]
        v2 = v_ref[0, hi].reshape(km * lc, dk)
        o = jax.lax.dot_general(
            w, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = o + (p_new / lsum) * vnew_ref[0, hi].astype(jnp.float32)
        out_ref[0, hi] = o.astype(out_ref.dtype)


def run_scratch(k, v, q, k_new, v_new, anc, pos):
    b, h, km, lc, dk = k.shape
    scale = 1.0 / math.sqrt(dk)
    row3 = lambda i, j, pos_ref: (i, 0, 0)
    row = lambda i, j, pos_ref: (i, j, 0, 0)
    row5 = lambda i, j, pos_ref: (i, j, 0, 0, 0)
    return pl.pallas_call(
        functools.partial(_scr_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, 1),
            in_specs=[
                pl.BlockSpec((1, h, km, dk), row),
                pl.BlockSpec((1, h, km, dk), row),
                pl.BlockSpec((1, h, km, dk), row),
                pl.BlockSpec((1, km, lc), row3),
                pl.BlockSpec((1, h, km, lc, dk), row5),
                pl.BlockSpec((1, h, km, lc, dk), row5),
            ],
            out_specs=pl.BlockSpec((1, h, km, dk), row),
            scratch_shapes=[pltpu.VMEM((km, km * lc), v.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, km, dk), v.dtype),
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, k_new, v_new, anc, k, v)


# ---------------- dump p itself ----------------
def _pdump_kernel(pos_ref, q_ref, knew_ref, anc_ref, k_ref, p_ref, *, scale):
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
        p_ref[0, hi] = jnp.exp(s - m) * valid_f


def run_pdump(k, q, k_new, anc, pos):
    b, h, km, lc, dk = k.shape
    scale = 1.0 / math.sqrt(dk)
    row3 = lambda i, j, pos_ref: (i, 0, 0)
    row = lambda i, j, pos_ref: (i, j, 0, 0)
    row5 = lambda i, j, pos_ref: (i, j, 0, 0, 0)
    return pl.pallas_call(
        functools.partial(_pdump_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, 1),
            in_specs=[
                pl.BlockSpec((1, h, km, dk), row),
                pl.BlockSpec((1, h, km, dk), row),
                pl.BlockSpec((1, km, lc), row3),
                pl.BlockSpec((1, h, km, lc, dk), row5),
            ],
            out_specs=pl.BlockSpec((1, h, km, km * lc), row),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, km, km * lc), jnp.float32),
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, k_new, anc, k)


def oracle_w(k, q, k_new, anc, pos, km, lc):
    b, h, _, _, dk = k.shape
    scale = 1.0 / math.sqrt(dk)
    anc_np = np.asarray(anc)
    valid = (
        (anc_np[:, :, None, :] == np.arange(km)[None, None, :, None])
        & (np.arange(lc) < pos - 1)[None, None, None, :]
    ).reshape(b, km, km * lc)
    kf = np.asarray(k, np.float64)
    qf = np.asarray(q, np.float64)
    knf = np.asarray(k_new, np.float64)
    s = np.einsum("bhid,bhjtd->bhijt", qf, kf).reshape(b, h, km, km * lc) * scale
    s = np.where(valid[:, None], s, MASK_MIN)
    s_new = np.einsum("bhid,bhid->bhi", qf, knf) * scale
    m = np.maximum(s.max(-1), s_new)
    p = np.exp(s - m[..., None]) * valid[:, None]
    p_new = np.exp(s_new - m)
    lsum = p.sum(-1) + p_new
    return p, p_new, lsum


def main():
    rng = np.random.RandomState(0)
    cases = [
        (jnp.float32, 1e-4, (2, 3, 4, 16, 64), 9),
        (jnp.bfloat16, 0.05, (2, 4, 10, 104, 64), 52),
    ]
    failures = 0
    for dtype, tol, (b, h, km, lc, dk), pos in cases:
        k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos,
                                               dtype=dtype)
        p, p_new, lsum = oracle_w(k, q, k_new, anc, pos, km, lc)

        # pdump: is the in-kernel p correct?
        got_p = np.asarray(run_pdump(k, q, k_new, anc, pos), np.float64)
        err_p = np.max(np.abs(got_p - p))
        print(f"pdump    {dtype.__name__:8s} ({b},{h},{km},{lc},{dk}) "
              f"pos={pos}: relerr={err_p:.2e} "
              f"{'OK' if err_p < max(tol, 1e-3) else 'BAD'}", flush=True)
        failures += err_p >= max(tol, 1e-3)

        # injected: host-computed w -> pure matmul kernel
        w_host = (p / lsum[..., None]).astype(np.asarray(v).dtype)
        got_o = np.asarray(run_injected(jnp.asarray(w_host), v), np.float64)
        want_o = np.einsum(
            "bhij,bhjd->bhid", w_host.astype(np.float64),
            np.asarray(v, np.float64).reshape(b, h, km * lc, dk))
        err_i = np.max(np.abs(got_o - want_o) / (np.abs(want_o) + 1e-3))
        print(f"injected {dtype.__name__:8s} ({b},{h},{km},{lc},{dk}) "
              f"pos={pos}: relerr={err_i:.2e} "
              f"{'OK' if err_i < tol else 'BAD'}", flush=True)
        failures += err_i >= tol

        # scratch: in-kernel w forced through VMEM
        got_s = np.asarray(run_scratch(k, v, q, k_new, v_new, anc, pos),
                           np.float64)
        want = ref_group_attend(k, v, q, k_new, v_new, anc, pos)
        err_s = np.max(np.abs(got_s - want) / (np.abs(want) + 1e-3))
        print(f"scratch  {dtype.__name__:8s} ({b},{h},{km},{lc},{dk}) "
              f"pos={pos}: relerr={err_s:.2e} "
              f"{'OK' if err_s < tol else 'BAD'}", flush=True)
        failures += err_s >= tol
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
