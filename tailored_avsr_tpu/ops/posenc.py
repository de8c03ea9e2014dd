"""Positional encodings: absolute, scaled-absolute, and relative (XL-style).

Capability parity with espnet's ``PositionalEncoding`` / ``ScaledPositionalEncoding``
/ ``RelPositionalEncoding`` ("latest" rel_pos_type) as selected by the reference
(/root/reference/src/encoder/branchformer/encoder.py:95-120, src/embedding_for_avsr/
default.py). TPU-first: the tables are computed functionally from static shapes at
trace time (constant-folded by XLA), no persistent buffers.

Relative table layout (length ``2T-1``): index ``j`` encodes relative position
``T-1-j`` so that after the rel-shift in attention, score(i, j) reads the entry
for distance ``i - j``. This matches espnet's pe_positive/pe_negative concat.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp


def sinusoidal_table(positions: np.ndarray, d_model: int) -> np.ndarray:
    """Sin/cos table for arbitrary (possibly negative) integer positions."""
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model))
    pe = np.zeros((len(positions), d_model), dtype=np.float32)
    ang = positions[:, None].astype(np.float64) * div[None, :]
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


def abs_pos_table(max_len: int, d_model: int) -> np.ndarray:
    return sinusoidal_table(np.arange(max_len), d_model)


def rel_pos_table(t: int, d_model: int) -> np.ndarray:
    """(2t-1, d) table; row j encodes relative position t-1-j.

    Built exactly like espnet's "latest" RelPositionalEncoding: positive part
    uses sin(pos), negative part sin(-pos) (cos is even so unchanged).
    """
    positions = np.arange(t - 1, -t, -1)  # t-1 ... 0 ... -(t-1)
    return sinusoidal_table(positions, d_model)


class AbsolutePositionalEncoding(nn.Module):
    """x * sqrt(d) + PE, then dropout."""

    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        t, d = x.shape[-2], x.shape[-1]
        pe = jnp.asarray(abs_pos_table(t, d), dtype=x.dtype)
        x = x * jnp.asarray(np.sqrt(d), dtype=x.dtype) + pe[None]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

    def at_position(self, x: jnp.ndarray, pos, max_len: int) -> jnp.ndarray:
        """Single-step variant: x (B, 1, D) at (traced) position ``pos``."""
        d = x.shape[-1]
        pe = jnp.asarray(abs_pos_table(max_len, d), dtype=x.dtype)
        row = jax.lax.dynamic_index_in_dim(pe, pos, axis=0, keepdims=False)
        return x * jnp.asarray(np.sqrt(d), dtype=x.dtype) + row[None, None, :]


class ScaledPositionalEncoding(nn.Module):
    """x + alpha * PE with learned scalar alpha (espnet ScaledPositionalEncoding)."""

    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        t, d = x.shape[-2], x.shape[-1]
        alpha = self.param("alpha", nn.initializers.ones, (1,))
        pe = jnp.asarray(abs_pos_table(t, d), dtype=x.dtype)
        x = x + alpha.astype(x.dtype) * pe[None]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class RelPositionalEncoding(nn.Module):
    """Returns (x * sqrt(d) with dropout, pos_emb (1, 2T-1, d) with dropout)."""

    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        t, d = x.shape[-2], x.shape[-1]
        pos = jnp.asarray(rel_pos_table(t, d), dtype=x.dtype)[None]
        x = x * jnp.asarray(np.sqrt(d), dtype=x.dtype)
        drop = nn.Dropout(self.dropout_rate)
        x = drop(x, deterministic=deterministic)
        pos = drop(pos, deterministic=deterministic)
        return x, pos


class LegacyRelPositionalEncoding(nn.Module):
    """Pre-2020 espnet relative encoding (``rel_pos_type: legacy``): the table
    has only ``T`` rows (positions 0..T-1, no negative side); the matching
    legacy rel-shift in attention reads row ``T-1-(i-j)`` for key j <= query i.
    Registered because the reference exposes the choice
    (/root/reference/src/encoder/branchformer/encoder.py:95-120)."""

    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        t, d = x.shape[-2], x.shape[-1]
        pos = jnp.asarray(abs_pos_table(t, d), dtype=x.dtype)[None]
        x = x * jnp.asarray(np.sqrt(d), dtype=x.dtype)
        drop = nn.Dropout(self.dropout_rate)
        x = drop(x, deterministic=deterministic)
        pos = drop(pos, deterministic=deterministic)
        return x, pos
