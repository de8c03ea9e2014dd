#!/usr/bin/env python
"""Bisect the compiled group-attend kernel's numerics failure on TPU.

The interpret-mode kernel matches the oracle; compiled Mosaic does not
(relerr ~0.5 on the flagship shape). This dumps the kernel's intermediates
(valid mask, masked logits) as extra outputs and compares each against the
NumPy oracle to localize the miscompile.
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


def _dbg_kernel(pos_ref, q_ref, knew_ref, vnew_ref, anc_ref, k_ref, v_ref,
                out_ref, valid_ref, s_ref, m_ref, lsum_ref, ocache_ref, *, scale):
    _, hb, km, lc, dk = k_ref.shape
    anc = anc_ref[0]
    tt = jax.lax.broadcasted_iota(jnp.int32, (km, lc), 1)
    live = tt < pos_ref[0] - 1
    valid_i = jnp.concatenate(
        [((anc == j) & live).astype(jnp.int32) for j in range(km)], axis=1)
    valid = valid_i > 0
    valid_f = valid_i.astype(jnp.float32)
    valid_ref[0] = valid_i
    for hi in range(hb):
        q = q_ref[0, hi]
        k2 = k_ref[0, hi].reshape(km * lc, dk)
        s = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(valid, s, MASK_MIN)
        s_ref[0, hi] = s
        s_new = jnp.sum(
            q.astype(jnp.float32) * knew_ref[0, hi].astype(jnp.float32),
            axis=1, keepdims=True) * scale
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_new)
        p = jnp.exp(s - m) * valid_f
        p_new = jnp.exp(s_new - m)
        lsum = jnp.sum(p, axis=1, keepdims=True) + p_new
        m_ref[0, hi] = m
        lsum_ref[0, hi] = lsum
        w = (p / lsum).astype(v_ref.dtype)
        v2 = v_ref[0, hi].reshape(km * lc, dk)
        o = jax.lax.dot_general(
            w, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ocache_ref[0, hi] = o
        o = o + (p_new / lsum) * vnew_ref[0, hi].astype(jnp.float32)
        out_ref[0, hi] = o.astype(out_ref.dtype)


def dbg_group_attend(k, v, q, k_new, v_new, anc, pos):
    b, h, km, lc, dk = k.shape
    scale = 1.0 / math.sqrt(dk)
    hb = h
    row3 = lambda i, j, pos_ref: (i, 0, 0)
    row = lambda i, j, pos_ref: (i, j, 0, 0)
    row5 = lambda i, j, pos_ref: (i, j, 0, 0, 0)
    return pl.pallas_call(
        functools.partial(_dbg_kernel, scale=scale),
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
            out_specs=[
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, km, km * lc), row3),
                pl.BlockSpec((1, hb, km, km * lc), row),
                pl.BlockSpec((1, hb, km, 1), row),
                pl.BlockSpec((1, hb, km, 1), row),
                pl.BlockSpec((1, hb, km, dk), row),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, km, dk), v.dtype),
            jax.ShapeDtypeStruct((b, km, km * lc), jnp.int32),
            jax.ShapeDtypeStruct((b, h, km, km * lc), jnp.float32),
            jax.ShapeDtypeStruct((b, h, km, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, h, km, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, h, km, dk), jnp.float32),
        ],
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, k_new, v_new, anc, k, v)


def main():
    rng = np.random.RandomState(0)
    b, h, km, lc, dk = 2, 4, 10, 104, 64
    pos = 52
    dtype = jnp.bfloat16
    k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos, dtype=dtype)
    out, valid_i, s, m_k, lsum_k, ocache = dbg_group_attend(
        k, v, q, k_new, v_new, anc, pos)
    out, valid_i, s, m_k, lsum_k, ocache = map(
        np.asarray, (out, valid_i, s, m_k, lsum_k, ocache))

    # oracle pieces
    anc_np = np.asarray(anc)
    want_valid = (
        (anc_np[:, :, None, :] == np.arange(km)[None, None, :, None])
        & (np.arange(lc) < pos - 1)[None, None, None, :]
    ).reshape(b, km, km * lc).astype(np.int32)
    print("valid mask match:", np.array_equal(valid_i, want_valid))
    if not np.array_equal(valid_i, want_valid):
        d = np.argwhere(valid_i != want_valid)
        print("  first mismatches:", d[:10])
        print("  got:", valid_i[tuple(d[0])], "want:", want_valid[tuple(d[0])])

    kf = np.asarray(k, np.float64)
    qf = np.asarray(q, np.float64)
    scale = 1.0 / math.sqrt(dk)
    want_s = np.einsum("bhid,bhjtd->bhijt", qf, kf).reshape(b, h, km, km * lc) * scale
    want_s = np.where(want_valid[:, None].astype(bool), want_s, MASK_MIN)
    mask = want_valid[:, None].astype(bool) & np.ones((b, h, km, km * lc), bool)
    err_s = np.max(np.abs(s[mask] - want_s[mask]) / (np.abs(want_s[mask]) + 1e-3))
    print(f"masked-logit relerr (live entries): {err_s:.2e}")
    # also: are masked-out entries MASK_MIN in the kernel?
    print("dead entries == MASK_MIN:", bool(np.all(s[~mask] == MASK_MIN)))

    # oracle m / lsum / o_cache
    qf = np.asarray(q, np.float64)
    knf = np.asarray(k_new, np.float64)
    vf = np.asarray(v, np.float64)
    s_new = np.einsum("bhid,bhid->bhi", qf, knf) * scale
    want_m = np.maximum(want_s.max(axis=-1), s_new)
    want_p = np.exp(want_s - want_m[..., None]) * mask
    want_pn = np.exp(s_new - want_m)
    want_lsum = want_p.sum(axis=-1) + want_pn
    err_m = np.max(np.abs(m_k[..., 0] - want_m))
    err_l = np.max(np.abs(lsum_k[..., 0] - want_lsum) / (np.abs(want_lsum) + 1e-3))
    print(f"m err: {err_m:.2e}  lsum relerr: {err_l:.2e}")
    want_oc = np.einsum(
        "bhij,bhjd->bhid",
        (want_p / want_lsum[..., None]),
        vf.reshape(b, h, km * lc, dk))
    err_oc = np.max(np.abs(ocache - want_oc) / (np.abs(want_oc) + 1e-3))
    print(f"o_cache relerr: {err_oc:.2e}")

    want = ref_group_attend(k, v, q, k_new, v_new, anc, pos)
    err = np.max(np.abs(out.astype(np.float64) - want) / (np.abs(want) + 1e-3))
    print(f"output relerr: {err:.2e}")
    # localize: per (b,h,i) worst error
    pe = np.max(np.abs(out.astype(np.float64) - want) / (np.abs(want) + 1e-3), axis=-1)
    bad = np.argwhere(pe > 0.1)
    print(f"bad rows (b,h,i) count: {len(bad)} / {pe.size}")
    print("sample bad rows:", bad[:20].tolist())


if __name__ == "__main__":
    main()
