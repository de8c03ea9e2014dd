"""Pallas TPU fused attention kernel (flash-style, with additive bias).

The encoder's rel-pos attention is scores = (q_u·k^T + rel_shift(q_v·p^T)) /
sqrt(dk). The content term + softmax + value matmul are fused here with an
online-softmax streaming over key blocks, so the (T, T) probability matrix
never round-trips HBM; the Toeplitz rel-pos term ``bias`` is computed by XLA
(one skinny matmul + reshape trick) and streamed into the kernel tile by tile.

Grid: (B*H, num_q_blocks, num_k_blocks), k innermost; m/l/acc scratch persists
across the k loop (standard TPU flash pattern). Masking is key-side (B, T)
validity — encoder self-attention only; fully-masked query rows produce zeros
(matching ops.attention._masked_softmax semantics).

Used by RelPositionMultiHeadedAttention / MultiHeadedAttention when
``use_flash`` is enabled (bench/TPU path); the plain XLA path remains the
reference implementation and the CPU/test path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, mask_ref,
    o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, num_k_blocks: int,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (BQ, dk)
    k = k_ref[0]  # (BK, dk)
    v = v_ref[0]  # (BK, dk)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, BK)
    s = s + bias_ref[0].astype(jnp.float32) * scale
    valid = mask_ref[0] > 0  # (1, BK) int32 -> bool
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scratch[:]  # (BQ, 1)
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # exp(NEG_INF - NEG_INF) = 1 for fully-masked rows: force those to 0
    p = jnp.exp(s - m_new) * (valid.astype(jnp.float32))
    corr = jnp.exp(m_prev - m_new)
    l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scratch[:] = acc_scratch[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        # fully-masked rows have l == 0 -> emit zeros, not NaN
        l = l_scratch[:]
        o_ref[0] = jnp.where(
            l > 0, acc_scratch[:] / jnp.maximum(l, 1e-30), 0.0
        ).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,  # (B, H, T, dk) — pre-biased query (q + pos_bias_u)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,  # (B, H, T, T) additive, pre-scale
    mask: Optional[jnp.ndarray] = None,  # (B, T) True = valid key
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, dk = q.shape
    scale = 1.0 / (dk ** 0.5)
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    # pad T to a multiple of the blocks
    tq = -(-t // block_q) * block_q
    tk = -(-t // block_k) * block_k
    pad_q, pad_k = tq - t, tk - t
    if pad_q or pad_k:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    if bias is None:
        bias = jnp.zeros((b, h, tq, tk), q.dtype)
    elif pad_q or pad_k:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad_q), (0, pad_k)))
    if mask is None:
        mask = jnp.ones((b, t), bool)
    key_mask = jnp.pad(mask, ((0, 0), (0, pad_k))).astype(jnp.int32)[:, None, :]  # (B,1,TK)

    bh = b * h
    qf = q.reshape(bh, tq, dk)
    kf = k.reshape(bh, tk, dk)
    vf = v.reshape(bh, tk, dk)
    biasf = bias.reshape(bh, tq, tk)
    nq, nk = tq // block_q, tk // block_k

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, num_k_blocks=nk),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, dk), lambda bhi, qi, ki: (bhi, qi, 0)),
            pl.BlockSpec((1, block_k, dk), lambda bhi, qi, ki: (bhi, ki, 0)),
            pl.BlockSpec((1, block_k, dk), lambda bhi, qi, ki: (bhi, ki, 0)),
            pl.BlockSpec((1, block_q, block_k), lambda bhi, qi, ki: (bhi, qi, ki)),
            pl.BlockSpec((1, 1, block_k), lambda bhi, qi, ki, h=h: (bhi // h, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dk), lambda bhi, qi, ki: (bhi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, dk), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dk), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, biasf, key_mask)
    return out.reshape(b, h, tq, dk)[:, :, :t, :]
