"""Pre-encoders and post-encoders.

Capability parity with the espnet preencoder/postencoder registry slots the
reference exposes (/root/reference/src/tasks/asr.py:135-144 'linear'
preencoder via espnet LinearProjection; :167-175 postencoder). The
hugging_face postencoder remains gated on external weights and is out of
scope for parity (no shipped reference config uses it).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LinearProjection(nn.Module):
    """Linear + dropout projection (espnet LinearProjection preencoder)."""

    output_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray, *, deterministic: bool = True):
        x = nn.Dense(self.output_size, name="linear_out")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x, lengths


class LinearPostencoder(nn.Module):
    """Linear projection after the encoder (postencoder slot)."""

    output_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        return nn.Dense(self.output_size, name="linear_out")(x), lengths
