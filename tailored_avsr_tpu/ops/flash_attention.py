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
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

NEG_INF = -1.0e30


def _def_batch_partition(op, core, batch_dims, rule):
    """Register a batch-dim GSPMD/Shardy partitioning rule on ``op``.

    The flash kernels are embarrassingly parallel over the batch dimension
    and nothing else (attention is global over keys). Without a rule, a
    pallas_call under a ``jit`` over a mesh forces operand replication — the
    exact silent fallback pod-batched decoding must not take. With this rule
    the kernel runs per batch shard on whatever mesh axes the caller put on
    dim 0 of ``q``; operands listed with ``batch_dims[i] is None`` (e.g. the
    per-head rel-pos table) are replicated, and any other incoming sharding
    is re-sharded at the op boundary.

    ``core`` is the undecorated implementation (arrays first, then the
    static args, which custom_partitioning prepends to the callbacks).
    """

    def _spec(rank, bdim, baxis):
        parts = [None] * rank
        if bdim is not None and baxis is not None:
            parts[bdim] = baxis
        return P(*parts)

    def _baxis(arg_shapes):
        qspec = arg_shapes[0].sharding.spec
        return qspec[0] if len(qspec) else None

    def infer(*a):
        mesh, arg_shapes, result_shape = a[-3], a[-2], a[-1]
        return NamedSharding(
            mesh, _spec(len(result_shape.shape), 0, _baxis(arg_shapes))
        )

    def partition(*a):
        statics = a[:-3]
        mesh, arg_shapes, result_shape = a[-3:]
        baxis = _baxis(arg_shapes)
        arg_sh = tuple(
            NamedSharding(mesh, _spec(len(s.shape), bd, baxis))
            for s, bd in zip(arg_shapes, batch_dims)
        )
        out_sh = NamedSharding(
            mesh, _spec(len(result_shape.shape), 0, baxis)
        )

        def lower(*arrays):
            return core(*arrays, *statics)

        return mesh, lower, out_sh, arg_sh

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )


def _attn_kernel(
    q_ref, k_ref, v_ref, *rest,
    scale: float, num_k_blocks: int, has_bias: bool = True,
):
    if has_bias:
        (bias_ref, mask_ref, o_ref,
         m_scratch, l_scratch, acc_scratch) = rest
    else:
        bias_ref = None
        (mask_ref, o_ref, m_scratch, l_scratch, acc_scratch) = rest
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
    if has_bias:
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


def _attn_rel_kernel(
    q_ref, k_ref, v_ref, qv_ref, plo_ref, phi_ref, mask_ref,
    o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, num_k_blocks: int, block: int,
):
    """Flash kernel computing the XL rel-pos Toeplitz term IN-KERNEL.

    For the tile (qi, ki) with square blocks B, bias[r, c] = q_v[r] . p[idx]
    where idx walks a 2B-1 span of the (2T-1)-row rel table that depends only
    on the block diagonal d = ki - qi. The launcher re-bases the table so each
    span starts B-aligned (p_lo/p_hi blocks); the per-row shift
    out[r, c] = s_rel[r, B + c - r] is realized with a barrel shifter —
    log2(B) conditional constant `pltpu.roll`s — followed by an ALIGNED static
    lane slice [B:2B]. No (B, H, T, T) bias ever exists in HBM.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (B, dk) content query (q + pos_bias_u)
    k = k_ref[0]
    v = v_ref[0]
    qv = qv_ref[0]  # (B, dk) positional query (q + pos_bias_v)
    p = jnp.concatenate([plo_ref[0], phi_ref[0]], axis=0)  # (2B, dk)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (B, B)
    s_rel = jax.lax.dot_general(
        qv, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (B, 2B); s_rel[r, u] pairs query row r with table span entry u
    # barrel shifter: row r needs a circular roll by +r; reading lanes
    # [B, 2B) afterwards yields s_rel[r, B + c - r] with no wraparound
    r_idx = jax.lax.broadcasted_iota(jnp.int32, s_rel.shape, 0)
    nbits = max(1, (block - 1).bit_length())
    for b in range(nbits):
        rolled = pltpu.roll(s_rel, 1 << b, axis=1)
        s_rel = jnp.where((r_idx >> b) & 1 == 1, rolled, s_rel)
    s = (s + s_rel[:, block:]) * scale

    valid = mask_ref[0] > 0  # (1, B) int32 -> bool
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scratch[:]
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p_ = jnp.exp(s - m_new) * (valid.astype(jnp.float32))
    corr = jnp.exp(m_prev - m_new)
    l_new = l_prev * corr + jnp.sum(p_, axis=-1, keepdims=True)
    acc_scratch[:] = acc_scratch[:] * corr + jax.lax.dot_general(
        p_.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l = l_scratch[:]
        o_ref[0] = jnp.where(
            l > 0, acc_scratch[:] / jnp.maximum(l, 1e-30), 0.0
        ).astype(o_ref.dtype)


def _flash_relpos_core(
    q: jnp.ndarray,  # (B, H, T, dk) content query (q + pos_bias_u)
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_rel: jnp.ndarray,  # (B, H, T, dk) positional query (q + pos_bias_v)
    pos: jnp.ndarray,  # (H, 2T-1, dk) per-head projected rel table
    mask: jnp.ndarray,  # (B, T) True = valid key
    block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, dk = q.shape
    scale = 1.0 / (dk ** 0.5)
    tp = -(-t // block) * block  # padded length (square blocks)
    pad = tp - t
    if pad:
        zp = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v, q_rel = (jnp.pad(x, zp) for x in (q, k, v, q_rel))
    key_mask = jnp.pad(mask, ((0, 0), (0, pad))).astype(jnp.int32)[:, None, :]

    n = tp // block
    # re-base the rel table so every tile's 2B-span starts block-aligned:
    # tile (qi, ki) needs table rows T-1 + (ki-qi-1)*B + u (u in [0, 2B));
    # aligned[m] = table[m + T-1 - n*B] puts that span at block (n-1+ki-qi)
    rows = 2 * n * block
    idx = jnp.arange(rows) + (t - 1 - n * block)
    safe = jnp.clip(idx, 0, 2 * t - 2)
    p_aligned = jnp.where(
        ((idx >= 0) & (idx <= 2 * t - 2))[None, :, None],
        jnp.take(pos, safe, axis=1),
        0.0,
    ).astype(q.dtype)  # (H, rows, dk)

    bh = b * h
    qf = q.reshape(bh, tp, dk)
    kf = k.reshape(bh, tp, dk)
    vf = v.reshape(bh, tp, dk)
    qvf = q_rel.reshape(bh, tp, dk)

    out = pl.pallas_call(
        functools.partial(
            _attn_rel_kernel, scale=scale, num_k_blocks=n, block=block
        ),
        grid=(bh, n, n),
        in_specs=[
            pl.BlockSpec((1, block, dk), lambda bhi, qi, ki: (bhi, qi, 0)),
            pl.BlockSpec((1, block, dk), lambda bhi, qi, ki: (bhi, ki, 0)),
            pl.BlockSpec((1, block, dk), lambda bhi, qi, ki: (bhi, ki, 0)),
            pl.BlockSpec((1, block, dk), lambda bhi, qi, ki: (bhi, qi, 0)),
            pl.BlockSpec(
                (1, block, dk),
                lambda bhi, qi, ki, h=h, n=n: (bhi % h, n - 1 + ki - qi, 0),
            ),
            pl.BlockSpec(
                (1, block, dk),
                lambda bhi, qi, ki, h=h, n=n: (bhi % h, n + ki - qi, 0),
            ),
            pl.BlockSpec(
                (1, 1, block), lambda bhi, qi, ki, h=h: (bhi // h, 0, ki)
            ),
        ],
        out_specs=pl.BlockSpec((1, block, dk), lambda bhi, qi, ki: (bhi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tp, dk), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, dk), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, qvf, p_aligned, p_aligned, key_mask)
    return out.reshape(b, h, tp, dk)[:, :, :t, :]


_flash_relpos_p = custom_partitioning(
    _flash_relpos_core, static_argnums=(6, 7)
)
_def_batch_partition(
    _flash_relpos_p, _flash_relpos_core,
    batch_dims=(0, 0, 0, 0, None, 0),
    rule="b h t d, b h s d, b h s d, b h t d, h r d, b s -> b h t d",
)


def flash_attention_relpos(
    q: jnp.ndarray,  # (B, H, T, dk) content query (q + pos_bias_u)
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_rel: jnp.ndarray,  # (B, H, T, dk) positional query (q + pos_bias_v)
    pos: jnp.ndarray,  # (H, 2T-1, dk) per-head projected rel table
    mask: Optional[jnp.ndarray] = None,  # (B, T) True = valid key
    block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused XL rel-pos flash attention with the Toeplitz term computed
    in-kernel (see _attn_rel_kernel). Equivalent to
    ``flash_attention(q, k, v, bias=rel_shift(q_rel @ pos^T), mask)`` without
    ever materializing the (B, H, T, T) bias in HBM.

    Carries a batch-dim partitioning rule (``_def_batch_partition``): under a
    mesh the kernel runs per batch shard instead of forcing replication."""
    if mask is None:
        mask = jnp.ones((q.shape[0], q.shape[2]), bool)
    return _flash_relpos_p(q, k, v, q_rel, pos, mask, block, interpret)


def _flash_core(
    q: jnp.ndarray,  # (B, H, T, dk) — pre-biased query (q + pos_bias_u)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],  # (B, H, T, T) additive, pre-scale, or None
    mask: jnp.ndarray,  # (B, T) True = valid key
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
    has_bias = bias is not None
    if has_bias and (pad_q or pad_k):
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad_q), (0, pad_k)))
    key_mask = jnp.pad(mask, ((0, 0), (0, pad_k))).astype(jnp.int32)[:, None, :]  # (B,1,TK)

    bh = b * h
    qf = q.reshape(bh, tq, dk)
    kf = k.reshape(bh, tk, dk)
    vf = v.reshape(bh, tk, dk)
    nq, nk = tq // block_q, tk // block_k

    in_specs = [
        pl.BlockSpec((1, block_q, dk), lambda bhi, qi, ki: (bhi, qi, 0)),
        pl.BlockSpec((1, block_k, dk), lambda bhi, qi, ki: (bhi, ki, 0)),
        pl.BlockSpec((1, block_k, dk), lambda bhi, qi, ki: (bhi, ki, 0)),
    ]
    inputs = [qf, kf, vf]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, block_q, block_k), lambda bhi, qi, ki: (bhi, qi, ki))
        )
        inputs.append(bias.reshape(bh, tq, tk))
    in_specs.append(
        pl.BlockSpec((1, 1, block_k), lambda bhi, qi, ki, h=h: (bhi // h, 0, ki))
    )
    inputs.append(key_mask)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, num_k_blocks=nk, has_bias=has_bias
        ),
        grid=(bh, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, dk), lambda bhi, qi, ki: (bhi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, dk), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dk), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    return out.reshape(b, h, tq, dk)[:, :, :t, :]


def _flash_bias_core(q, k, v, bias, mask, block_q, block_k, interpret):
    return _flash_core(q, k, v, bias, mask, block_q, block_k, interpret)


def _flash_nobias_core(q, k, v, mask, block_q, block_k, interpret):
    return _flash_core(q, k, v, None, mask, block_q, block_k, interpret)


_flash_bias_p = custom_partitioning(_flash_bias_core, static_argnums=(5, 6, 7))
_def_batch_partition(
    _flash_bias_p, _flash_bias_core,
    batch_dims=(0, 0, 0, 0, 0),
    rule="b h t d, b h s d, b h s d, b h t s, b s -> b h t d",
)
_flash_nobias_p = custom_partitioning(
    _flash_nobias_core, static_argnums=(4, 5, 6)
)
_def_batch_partition(
    _flash_nobias_p, _flash_nobias_core,
    batch_dims=(0, 0, 0, 0),
    rule="b h t d, b h s d, b h s d, b s -> b h t d",
)


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
    """Flash attention with optional additive bias (see module docstring).

    Carries a batch-dim partitioning rule (``_def_batch_partition``): under a
    mesh the kernel runs per batch shard instead of forcing replication."""
    if mask is None:
        mask = jnp.ones((q.shape[0], q.shape[2]), bool)
    if bias is None:
        return _flash_nobias_p(q, k, v, mask, block_q, block_k, interpret)
    return _flash_bias_p(q, k, v, bias, mask, block_q, block_k, interpret)
