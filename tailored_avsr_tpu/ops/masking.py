"""Length/mask utilities.

TPU-native counterpart of espnet's ``make_pad_mask`` family (used all over the
reference, e.g. /root/reference/src/encoder/branchformer/encoder.py). We keep a
single convention: boolean ``(B, T)`` masks, True = valid frame. Pad masks are
just ``~mask``. Everything is shape-static and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

# Large negative value used to kill masked logits before a softmax. Matches the
# reference's use of dtype-min fills (finfo.min) closely enough in fp32/bf16
# while staying finite in bf16.
MASK_MIN = -1.0e9


def make_valid_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) bool mask, True where t < length."""
    t = jnp.arange(max_len, dtype=lengths.dtype)
    return t[None, :] < lengths[:, None]


def mask_lengths(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) bool mask -> (B,) int32 lengths."""
    return jnp.sum(mask.astype(jnp.int32), axis=-1)


def masked_fill(x: jnp.ndarray, mask: jnp.ndarray, value: float) -> jnp.ndarray:
    """Set positions where ``mask`` is False to ``value`` (broadcasting mask)."""
    return jnp.where(mask, x, jnp.asarray(value, dtype=x.dtype))


def apply_mask(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded frames of a (B, T, ...) tensor given a (B, T) mask."""
    extra = x.ndim - mask.ndim
    m = mask.reshape(mask.shape + (1,) * extra)
    return x * m.astype(x.dtype)
