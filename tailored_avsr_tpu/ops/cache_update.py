"""In-place beam KV-cache column writes (Pallas block read-modify-write).

The ancestry-protocol beam decode (decode/beam_search.py) writes ONE time
column into every layer's (B, H, K, Lc, dk) KV cache per step. XLA lowers
that dynamic-update-slice to a pathological scalarized scatter: measured
709 us per 32 MB leaf inside the decode while-loop — slower than copying the
whole buffer (287 us) — because the written column is a single sublane in
each of the cache's (8, 128) tiles (scripts/bench_cache_write.py; a 2-D flat
DUS of the same bytes takes 22 us). At ~44 cache leaves per flagship decode
step (16-layer LM + 6-layer decoder, k and v) that scatter IS the decode
bottleneck: ~30 ms of a 35 ms step.

Mosaic cannot DMA a single column either — slices along a tiled dim must be
tile-aligned (8 sublanes for bf16/f32 tilings). So this kernel does an
aligned read-modify-write of the 8-column block containing ``pos``: a
single-step grid whose BlockSpec index_map (scalar-prefetched ``pos``)
selects block ``pos // 8`` along Lc; the kernel replaces sublane
``pos % 8`` with the new column (vector select) and writes the block back.
With ``input_output_aliases`` the cache buffer is donated, so the blocks the
grid never touches keep their contents — the write is truly in place, no
full-leaf copy, no scatter loop. Block traffic is ~2 x B*H*K*8*dk bytes per
leaf (~5 MB at the flagship shape) instead of a scalarized pass over 32 MB.

The cache layout stays group-major (B, H, K, Lc, dk), which is the layout
the ancestry attend's dot_generals already stream at full bandwidth
(ops/attention.py attend_kv_anc). Requires Lc padded to a multiple of 8
(init_cache_group in models/decoder.py and models/lm.py allocate it so).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _blk(dtype) -> int:
    """Sublane tile along Lc: 8 for f32/bf16 tilings, 32 for int8 (the
    quantized-cache payload) — Mosaic slices along a tiled dim must be
    tile-aligned."""
    return 32 if jnp.dtype(dtype).itemsize == 1 else 8


def _rmw_col_kernel(pos_ref, col_ref, cache_blk_ref, out_blk_ref):
    blk = out_blk_ref.shape[3]
    sub = pos_ref[0] % blk  # column's sublane within the selected block
    off = jax.lax.broadcasted_iota(jnp.int32, out_blk_ref.shape, 3)
    out_blk_ref[...] = jnp.where(
        off == sub, col_ref[...], cache_blk_ref[...]
    )


def _rmw_col_kv_kernel(
    pos_ref, kcol_ref, vcol_ref, kblk_ref, vblk_ref, kout_ref, vout_ref
):
    blk = kout_ref.shape[3]
    sub = pos_ref[0] % blk
    off = jax.lax.broadcasted_iota(jnp.int32, kout_ref.shape, 3)
    kout_ref[...] = jnp.where(off == sub, kcol_ref[...], kblk_ref[...])
    vout_ref[...] = jnp.where(off == sub, vcol_ref[...], vblk_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def write_cache_column(
    cache: jnp.ndarray,  # (B, H, K, Lc, dk) group-major beam cache, Lc % 8 == 0
    col: jnp.ndarray,  # (B, H, K, dk) this step's column, any float dtype
    pos: jnp.ndarray,  # scalar int: target time index (column to overwrite)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """cache[:, :, :, pos, :] = col, in place (cache buffer is aliased)."""
    b, h, k, lc, dk = cache.shape
    blk = _blk(cache.dtype)
    if lc % blk != 0:
        raise ValueError(f"cache Lc dim must be a multiple of {blk}, got {lc}")
    # Clamp: the beam loop's unroll-2 overshoot step may present pos == lc
    # (odd lmax rounded to 8). That write is result-inert (the loop exits
    # before the column is ever read), but an unclamped pos // 8 would select
    # a block past the buffer — an out-of-bounds DMA with undefined Mosaic
    # behavior. Clamping retargets it to the last in-bounds column.
    pos = jnp.minimum(jnp.asarray(pos, jnp.int32), lc - 1)
    upd = col.astype(cache.dtype)[:, :, :, None, :]
    # Grid over B: a full-batch block is B*H*K*8*dk*4 bytes (20 MB at the
    # flagship decode shape), which overflows the 16 MB scoped-VMEM budget
    # once Mosaic double-buffers it. Per-batch-row blocks are ~160 KB and
    # the 8-column DMAs pipeline across grid steps.
    blk_at_pos = lambda i, pos_ref: (i, 0, 0, pos_ref[0] // blk, 0)
    return pl.pallas_call(
        _rmw_col_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, k, 1, dk), lambda i, pos_ref: (i, 0, 0, 0, 0)),
                pl.BlockSpec((1, h, k, blk, dk), blk_at_pos),
            ],
            out_specs=pl.BlockSpec((1, h, k, blk, dk), blk_at_pos),
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), upd, cache)


@functools.partial(jax.jit, static_argnames=("interpret",))
def write_cache_columns_kv(
    kcache: jnp.ndarray,  # (B, H, K, Lc, dk) group-major key cache, Lc % 8 == 0
    vcache: jnp.ndarray,  # (B, H, K, Lc, dk) value cache, same shape/dtype
    kcol: jnp.ndarray,  # (B, H, K, dk) this step's key column
    vcol: jnp.ndarray,  # (B, H, K, dk) this step's value column
    pos: jnp.ndarray,  # scalar int: target time index
    *,
    interpret: bool = False,
):
    """K and V column writes of one layer in ONE kernel (both aliased).

    The decode step writes 44 cache leaves (16-layer LM + 6-layer decoder,
    k and v); per-leaf ``write_cache_column`` calls are grid-step-overhead
    bound (~31 us per leaf vs <1 us of block DMA). Pairing k/v halves the
    call count, and gridding over ``gb`` batch rows per step (largest
    power-of-2 with the 8-column block under ~1 MB) cuts the per-call grid
    from B steps to B/gb — measured end to end in scripts/sweep_beam_cost.py.
    """
    b, h, k, lc, dk = kcache.shape
    blk = _blk(kcache.dtype)
    if lc % blk != 0:
        raise ValueError(f"cache Lc dim must be a multiple of {blk}, got {lc}")
    # Same out-of-bounds guard as write_cache_column: the overshoot step's
    # write may present pos == lc; clamp instead of relying on the caller's
    # parity invariant (unroll 2 + 8-rounded Lc).
    pos = jnp.minimum(jnp.asarray(pos, jnp.int32), lc - 1)
    itemsize = jnp.dtype(kcache.dtype).itemsize
    row_bytes = h * k * blk * dk * itemsize
    gb = 1
    while gb * 2 <= b and b % (gb * 2) == 0 and gb * 2 * row_bytes <= (1 << 20):
        gb *= 2
    kupd = kcol.astype(kcache.dtype)[:, :, :, None, :]
    vupd = vcol.astype(vcache.dtype)[:, :, :, None, :]
    col_spec = pl.BlockSpec((gb, h, k, 1, dk), lambda i, pos_ref: (i, 0, 0, 0, 0))
    blk_spec = pl.BlockSpec(
        (gb, h, k, blk, dk), lambda i, pos_ref: (i, 0, 0, pos_ref[0] // blk, 0)
    )
    out = pl.pallas_call(
        _rmw_col_kv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // gb,),
            in_specs=[col_spec, col_spec, blk_spec, blk_spec],
            out_specs=[blk_spec, blk_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(kcache.shape, kcache.dtype),
            jax.ShapeDtypeStruct(vcache.shape, vcache.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), kupd, vupd, kcache, vcache)
    return out[0], out[1]
