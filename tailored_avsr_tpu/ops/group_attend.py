"""Pallas TPU fused ancestry-group attention for beam decoding.

``MultiHeadedAttention.attend_kv_anc`` (ops/attention.py) scores every beam
hypothesis against all ``beam * Lc`` columns of its group's never-reordered KV
cache with a one-hot ancestry mask. As two XLA ``dot_general``s that path
materializes the (B, H, beam, beam, Lc) logits AND the probabilities tensor in
HBM every step — at the flagship decode shape (batch 32, beam 10, Lc 104,
22 cached layers) that is ~6-9 GB/step of pure softmax-intermediate traffic,
several times the KV cache bytes actually being attended over, and it does not
shrink with bf16 caches (the logits are f32).

This kernel is the flash-attention treatment of that group attend: one grid
step per batch row streams the (H, K, Lc, dk) K and V blocks through VMEM,
computes logits + ancestry mask + softmax + value matmul entirely on-chip, and
writes only the (H, K, dk) output — HBM traffic collapses to the cache bytes
(the roofline floor). No online-softmax pass structure is needed: one beam
group's whole K block (~1 MB bf16) fits VMEM comfortably.

Layout notes (Mosaic):
- the (1, H, K, Lc, dk) block keeps the cache's native group-major tiling
  ((Lc, dk) minor, Lc 8-aligned by ``init_cache_group``); collapsing (K, Lc)
  into one sublane axis for the MXU is a free leading-dim reshape.
- the ancestry mask is built per j in K static pieces and concatenated on the
  lane axis — no vector integer div/mod.
- the new (self) column is folded in after the cache matmuls, exactly like the
  XLA path: its logit joins the running max and the normalizer.

Numerics match ``attend_kv_anc`` up to one deliberate improvement: the QK^T
products accumulate in f32 on the MXU (``preferred_element_type``) where the
XLA path's einsum rounds through bf16 before its upcast. Validated against the
XLA path in tests/test_group_attend.py (exact for f32 inputs).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tailored_avsr_tpu.ops.masking import MASK_MIN


def _group_attend_kernel(
    pos_ref,  # scalar prefetch: (1,) int32
    q_ref,  # (1, H, K, dk)
    knew_ref,  # (1, H, K, dk)
    vnew_ref,  # (1, H, K, dk)
    anc_ref,  # (1, K, Lc_full) int32 — always full width: Mosaic requires a
    #     narrowed lane dim to be 128-divisible, and at ~4 KB the anc block is
    #     not worth narrowing (the DMA savings are all in K/V)
    k_ref,  # (1, H, K, Lc, dk)
    v_ref,  # (1, H, K, Lc, dk)
    out_ref,  # (1, H, K, dk)
    *,
    scale: float,
):
    _, hb, km, lc, dk = k_ref.shape  # hb = heads per grid step; lc = width
    anc = anc_ref[0, :, :lc]  # (K, Lc) static slice of the full-width block
    tt = jax.lax.broadcasted_iota(jnp.int32, (km, lc), 1)
    live = tt < pos_ref[0] - 1
    # valid[i, j*Lc + t] = (anc[i, t] == j) & live[i, t]; j unrolled statically.
    # Concatenate in i32, not bool: Mosaic has no vreg layout for concatenated
    # i1 vectors ("Invalid vector register cast", bitcast_vreg i1->i32).
    valid_i = jnp.concatenate(
        [((anc == j) & live).astype(jnp.int32) for j in range(km)], axis=1
    )  # (K, K*Lc) {0,1}
    valid = valid_i > 0
    valid_f = valid_i.astype(jnp.float32)
    for hi in range(hb):
        q = q_ref[0, hi]  # (K, dk)
        k2 = k_ref[0, hi].reshape(km * lc, dk)
        s = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (K, K*Lc)
        s = jnp.where(valid, s, MASK_MIN)
        s_new = jnp.sum(
            q.astype(jnp.float32) * knew_ref[0, hi].astype(jnp.float32),
            axis=1, keepdims=True,
        ) * scale  # (K, 1)
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_new)
        p = jnp.exp(s - m) * valid_f  # (K, K*Lc) f32
        p_new = jnp.exp(s_new - m)  # (K, 1)
        lsum = jnp.sum(p, axis=1, keepdims=True) + p_new
        w = (p / lsum).astype(v_ref.dtype)
        v2 = v_ref[0, hi].reshape(km * lc, dk)
        o = jax.lax.dot_general(
            w, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, dk)
        o = o + (p_new / lsum) * vnew_ref[0, hi].astype(jnp.float32)
        out_ref[0, hi] = o.astype(out_ref.dtype)


def _group_attend_q_kernel(
    pos_ref,  # scalar prefetch: (1,) int32
    q_ref,  # (1, H, K, dk)
    knew_ref,  # (1, H, K, dk) unquantized self column
    vnew_ref,  # (1, H, K, dk)
    anc_ref,  # (1, K, Lc_full) int32 (full width, sliced in-kernel)
    ksf_ref,  # (1, H, K*Lc) f32 key scales, flattened to the attended width
    vsf_ref,  # (1, H, K*Lc) f32 value scales, flattened likewise
    k_ref,  # (1, H, K, Lc, dk) int8
    v_ref,  # (1, H, K, Lc, dk) int8
    out_ref,  # (1, H, K, dk)
    *,
    scale: float,
):
    """int8-cache variant of ``_group_attend_kernel``: same single fused
    (K, dk) x (dk, K*Lc) matmul per head on the upcast int8 payload, with
    logits = raw * ks[col] and the value scales folded into the softmax
    weights (w' = w * vs[col]) — HBM traffic halves vs bf16.

    The per-column scale rows arrive PRE-FLATTENED to the attended width by
    the XLA wrapper (scales are 1/dk of the payload bytes, so the slice+
    reshape outside is noise): building (1, K*Lc) from a (K, Lc) block
    in-kernel is a reshape INTO the lane axis — an unsupported Mosaic shape
    cast — and a lane concat of (1, Lc) sublane slices trips "offset
    mismatch on non-concat dimension". A first shipped revision streamed
    per source-beam j instead (km separate (K, Lc) matmuls + two block
    passes); it measured 26% SLOWER end-to-end than the exact bf16 kernel
    (measurements/r4/int8day/) — op issue count dominates at these tiny
    shapes, which is the same lesson as the row-major XLA layout note in
    ``attend_kv_anc``'s docstring."""
    _, hb, km, lc, dk = k_ref.shape
    anc = anc_ref[0, :, :lc]  # (K, Lc) static slice of the full-width block
    tt = jax.lax.broadcasted_iota(jnp.int32, (km, lc), 1)
    live = tt < pos_ref[0] - 1
    valid_i = jnp.concatenate(
        [((anc == j) & live).astype(jnp.int32) for j in range(km)], axis=1
    )  # (K, K*Lc) {0,1}; i32 concat — Mosaic has no i1 vreg concat
    valid = valid_i > 0
    valid_f = valid_i.astype(jnp.float32)
    for hi in range(hb):
        q = q_ref[0, hi]  # (K, dk)
        k2 = k_ref[0, hi].reshape(km * lc, dk).astype(q.dtype)  # int8 upcast
        s = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (ksf_ref[0, hi][None, :] * scale)  # (K, K*Lc)
        s = jnp.where(valid, s, MASK_MIN)
        s_new = jnp.sum(
            q.astype(jnp.float32) * knew_ref[0, hi].astype(jnp.float32),
            axis=1, keepdims=True,
        ) * scale  # (K, 1)
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_new)
        p = jnp.exp(s - m) * valid_f  # (K, K*Lc) f32
        p_new = jnp.exp(s_new - m)  # (K, 1)
        lsum = jnp.sum(p, axis=1, keepdims=True) + p_new
        w = ((p / lsum) * vsf_ref[0, hi][None, :]).astype(q.dtype)
        v2 = v_ref[0, hi].reshape(km * lc, dk).astype(q.dtype)
        o = jax.lax.dot_general(
            w, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, dk)
        o = o + (p_new / lsum) * vnew_ref[0, hi].astype(jnp.float32)
        out_ref[0, hi] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def group_attend_anc_q(
    k: jnp.ndarray,  # (B, H, K, Lc, dk) int8 group-major cached keys
    k_scale: jnp.ndarray,  # (B, H, K, Lc) per-column key scales
    v: jnp.ndarray,  # (B, H, K, Lc, dk) int8 cached values
    v_scale: jnp.ndarray,  # (B, H, K, Lc)
    q: jnp.ndarray,  # (B, H, K, dk)
    k_new: jnp.ndarray,  # (B, H, K, dk) this step's key column (bf16/f32)
    v_new: jnp.ndarray,  # (B, H, K, dk)
    anc: jnp.ndarray,  # (B, K, Lc) int32
    pos: jnp.ndarray,
    *,
    width: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused group attend over an int8-quantized cache; returns (B, H, K, dk)
    in ``v_new.dtype``. Same contract as ``group_attend_anc``; ``width`` must
    be a multiple of 32 (int8 sublane tile) when narrowing."""
    b, h, km, lc, dk = k.shape
    lc_full = lc
    if width is not None:
        if width % 32 != 0 or not (0 < width <= lc):
            raise ValueError(
                f"int8-cache width must be a multiple of 32 in (0, {lc}], "
                f"got {width}"
            )
        lc = width
    scale = 1.0 / math.sqrt(dk)
    leaf_bytes = km * lc * dk  # int8
    hb = h
    while hb > 1 and (h % hb != 0 or hb * leaf_bytes > (3 << 20)):
        hb -= 1
    # Pre-flatten the per-column scales to the attended width: the kernel's
    # fused matmul orders columns (j, t<lc), so ksf[b, h, j*lc + t] =
    # k_scale[b, h, j, t]. Scale bytes are payload/dk, so this XLA-side
    # slice+reshape copy is ~1.5% of the traffic the int8 payload saves.
    ksf = k_scale[:, :, :, :lc].astype(jnp.float32).reshape(b, h, km * lc)
    vsf = v_scale[:, :, :, :lc].astype(jnp.float32).reshape(b, h, km * lc)
    row3 = lambda i, j, pos_ref: (i, 0, 0)
    rowf = lambda i, j, pos_ref: (i, j, 0)
    row = lambda i, j, pos_ref: (i, j, 0, 0)
    row5 = lambda i, j, pos_ref: (i, j, 0, 0, 0)
    return pl.pallas_call(
        functools.partial(_group_attend_q_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hb),
            in_specs=[
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, km, lc_full), row3),
                pl.BlockSpec((1, hb, km * lc), rowf),
                pl.BlockSpec((1, hb, km * lc), rowf),
                pl.BlockSpec((1, hb, km, lc, dk), row5),
                pl.BlockSpec((1, hb, km, lc, dk), row5),
            ],
            out_specs=pl.BlockSpec((1, hb, km, dk), row),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, km, dk), v_new.dtype),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, k_new, v_new, anc,
      ksf, vsf, k, v)


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def group_attend_anc(
    k: jnp.ndarray,  # (B, H, K, Lc, dk) group-major cached keys
    v: jnp.ndarray,  # (B, H, K, Lc, dk) group-major cached values
    q: jnp.ndarray,  # (B, H, K, dk) query heads (group-major)
    k_new: jnp.ndarray,  # (B, H, K, dk) this step's key column
    v_new: jnp.ndarray,  # (B, H, K, dk) this step's value column
    anc: jnp.ndarray,  # (B, K, Lc) int32 ancestry (pad columns = -1)
    pos: jnp.ndarray,  # scalar: cache columns < pos-1 are live
    *,
    width: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused group attend; returns (B, H, K, dk) in ``v.dtype``.

    ``width`` (static, multiple of 8) narrows the attended cache to columns
    [0, width) — the K/V/anc BlockSpecs shrink, so the DMA only touches those
    bytes, no slicing copy. Callers guarantee pos - 1 <= width during a
    phase (decode.beam_search phase_widths); the result is bit-identical to
    the full-width attend because columns >= pos - 1 are masked dead anyway.
    """
    b, h, km, lc, dk = k.shape
    lc_full = lc
    if width is not None:
        if width % 8 != 0 or not (0 < width <= lc):
            raise ValueError(f"width must be a multiple of 8 in (0, {lc}], got {width}")
        lc = width
    scale = 1.0 / math.sqrt(dk)
    # Heads per grid step: a K/V block is hb*K*lc*dk bytes and Mosaic double-
    # buffers both leaves — cap it so long-Lc serving shapes (T up to the
    # 500-frame cap) stay within scoped VMEM. At the flagship decode shape
    # all heads fit in one step (hb = H).
    leaf_bytes = km * lc * dk * jnp.dtype(k.dtype).itemsize
    hb = h
    # exits with hb == 1 or h % hb == 0 satisfied (hb == 1 divides anything)
    while hb > 1 and (h % hb != 0 or hb * leaf_bytes > (3 << 20)):
        hb -= 1
    row3 = lambda i, j, pos_ref: (i, 0, 0)
    row = lambda i, j, pos_ref: (i, j, 0, 0)
    row5 = lambda i, j, pos_ref: (i, j, 0, 0, 0)
    return pl.pallas_call(
        functools.partial(_group_attend_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            # h innermost: the anc block's index is j-independent, so Mosaic
            # skips its re-fetch across the inner head steps
            grid=(b, h // hb),
            in_specs=[
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, km, lc_full), row3),
                pl.BlockSpec((1, hb, km, lc, dk), row5),
                pl.BlockSpec((1, hb, km, lc, dk), row5),
            ],
            out_specs=pl.BlockSpec((1, hb, km, dk), row),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, km, dk), v.dtype),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, k_new, v_new, anc, k, v)
