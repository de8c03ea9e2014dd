#!/usr/bin/env python
"""Round-2 candidate fixes for the group-attend value-matmul miscompile.

Established (measurements/r4/ga_scratch.log): in-kernel p is correct when
WRITTEN OUT; the dot is correct when its LHS is LOADED; the combination
computed-p -> MXU-LHS is miscompiled at the flagship shape, and a VMEM
scratch round-trip does not help (store-to-load forwarding). Candidates:

  revdot   : o^T = dot_general(v2, w, contract v2.dim0 with w.dim1) — w rides
             as the RHS of an A@B^T-form dot (contracted on LANES, which is
             the layout the first matmul produced it in), output (dk, K)
             transposed on write.
  padrows  : concat w with zero rows to a tile-aligned (16, K*Lc) LHS.
  tponly   : whole attend in transposed space — s^T = dot(k2, q^T) (K*Lc, K),
             softmax over SUBLANES, o^T = dot_general(v2, p^T, contract dim0
             with dim0) (A^T@B form; computed operand contracted on sublanes).
  f32store : scratch round-trip in f32 with the cast AFTER the reload
             (different enough that forwarding may not fold it).
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


def _kernel(pos_ref, q_ref, knew_ref, vnew_ref, anc_ref, k_ref, v_ref,
            out_ref, w_scr, *, scale, variant):
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
        if variant == "revdot":
            w = (p / lsum).astype(v_ref.dtype)
            ot = jax.lax.dot_general(
                v2, w, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (dk, K)
            o = ot.T
        elif variant == "padrows":
            w = (p / lsum).astype(v_ref.dtype)
            pad = jnp.zeros((16 - km, km * lc), w.dtype)
            w16 = jnp.concatenate([w, pad], axis=0)  # (16, K*Lc)
            o = jax.lax.dot_general(
                w16, v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:km]
        elif variant == "f32store":
            w_scr[...] = p / lsum
            w = w_scr[...].astype(v_ref.dtype)
            o = jax.lax.dot_general(
                w, v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            raise ValueError(variant)
        o = o + (p_new / lsum) * vnew_ref[0, hi].astype(jnp.float32)
        out_ref[0, hi] = o.astype(out_ref.dtype)


def _kernel_tponly(pos_ref, q_ref, knew_ref, vnew_ref, anc_ref, k_ref, v_ref,
                   out_ref, *, scale):
    _, hb, km, lc, dk = k_ref.shape
    anc = anc_ref[0]
    tt = jax.lax.broadcasted_iota(jnp.int32, (km, lc), 1)
    live = tt < pos_ref[0] - 1
    # transposed validity: (K*Lc, K)
    valid_i = jnp.concatenate(
        [((anc == j) & live).astype(jnp.int32) for j in range(km)], axis=1
    ).T  # (K*Lc, K)
    valid = valid_i > 0
    valid_f = valid_i.astype(jnp.float32)
    for hi in range(hb):
        q = q_ref[0, hi]  # (K, dk)
        k2 = k_ref[0, hi].reshape(km * lc, dk)
        st = jax.lax.dot_general(
            k2, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (K*Lc, K)
        st = jnp.where(valid, st, MASK_MIN)
        s_new = jnp.sum(
            q.astype(jnp.float32) * knew_ref[0, hi].astype(jnp.float32),
            axis=1, keepdims=True) * scale  # (K, 1)
        m = jnp.maximum(jnp.max(st, axis=0, keepdims=True), s_new.T)  # (1, K)
        pt = jnp.exp(st - m) * valid_f  # (K*Lc, K)
        p_new = jnp.exp(s_new - m.T)  # (K, 1)
        lsum = jnp.sum(pt, axis=0, keepdims=True).T + p_new  # (K, 1)
        wt = pt.astype(v_ref.dtype)
        ot = jax.lax.dot_general(
            v2 := v_ref[0, hi].reshape(km * lc, dk), wt,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (dk, K)
        o = ot.T / lsum
        o = o + (p_new / lsum) * vnew_ref[0, hi].astype(jnp.float32)
        out_ref[0, hi] = o.astype(out_ref.dtype)


def run(k, v, q, k_new, v_new, anc, pos, variant):
    b, h, km, lc, dk = k.shape
    scale = 1.0 / math.sqrt(dk)
    row3 = lambda i, j, pos_ref: (i, 0, 0)
    row = lambda i, j, pos_ref: (i, j, 0, 0)
    row5 = lambda i, j, pos_ref: (i, j, 0, 0, 0)
    if variant == "tponly":
        kern = functools.partial(_kernel_tponly, scale=scale)
        scratch = []
    else:
        kern = functools.partial(_kernel, scale=scale, variant=variant)
        scratch = [pltpu.VMEM((km, km * lc), jnp.float32)]
    return pl.pallas_call(
        kern,
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
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, km, dk), v.dtype),
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, k_new, v_new, anc, k, v)


def main():
    rng = np.random.RandomState(0)
    cases = [
        (jnp.bfloat16, 0.05, (2, 4, 10, 104, 64), 52),
        (jnp.bfloat16, 0.05, (2, 8, 10, 104, 64), 90),
        (jnp.float32, 1e-4, (1, 2, 3, 8, 64), 1),
        (jnp.float32, 1e-3, (2, 3, 4, 16, 64), 9),
    ]
    failures = 0
    for variant in ["revdot", "padrows", "tponly", "f32store"]:
        for dtype, tol, (b, h, km, lc, dk), pos in cases:
            kk, vv, qq, kn, vn, anc = make_case(
                rng, b, h, km, lc, dk, pos, dtype=dtype)
            try:
                got = np.asarray(run(kk, vv, qq, kn, vn, anc, pos, variant),
                                 np.float64)
            except Exception as e:  # noqa: BLE001
                print(f"{variant:9s} {dtype.__name__:8s} "
                      f"({b},{h},{km},{lc},{dk}) pos={pos}: "
                      f"ERROR {type(e).__name__}: {str(e)[:120]}", flush=True)
                failures += 1
                continue
            want = ref_group_attend(kk, vv, qq, kn, vn, anc, pos)
            err = np.max(np.abs(got - want) / (np.abs(want) + 1e-3))
            ok = "OK " if err < tol else "BAD"
            failures += err >= tol
            print(f"{variant:9s} {dtype.__name__:8s} "
                  f"({b},{h},{km},{lc},{dk}) pos={pos}: {ok} relerr={err:.2e}",
                  flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
