"""Per-column int8 quantization for the ancestry beam KV cache.

The beam+LM decode step is cache-bandwidth bound: the fused group attend
measures at ~91% of the HBM roofline (measurements/r4/lm_step profile), so
the only remaining throughput lever is fewer bytes. ``cache_dtype: int8``
stores each cache side as ``(payload int8, scale)`` with one symmetric scale
per written (row, head) column — the granularity a beam step naturally
produces — and the fused kernel folds the scales into the logits / softmax
weights (ops/group_attend.group_attend_anc_q), halving attend traffic vs
bf16.

This is deliberately NOT bit-exact vs the bf16 cache (max per-element error
is ~0.4% of the column max); it ships as an opt-in serving mode, off by
default, with the XLA dequantize formulation as the off-TPU/debug twin.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def quantize_kv_column(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., dk) -> (int8 payload (..., dk), f32 scale (...)).

    Symmetric per-column max-abs scaling; an all-zero column gets scale 0
    (dequantizes back to exact zeros — matches the zero-initialized cache).
    """
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = m / 127.0
    safe = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / safe[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, s


def dequantize_cache(payload: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """(..., Lc, dk) int8 + (..., Lc) scale -> (..., Lc, dk) in ``dtype``."""
    return (payload.astype(jnp.float32) * scale[..., None].astype(jnp.float32)).astype(dtype)
