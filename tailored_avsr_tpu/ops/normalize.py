"""Feature normalization: utterance-level and global mean-variance norm.

Capability parity with espnet's ``UtteranceMVN`` / ``GlobalMVN`` as registered
by the reference tasks (/root/reference/src/tasks/avsr.py:12-14; config
normalize: utterance_mvn, norm_means true / norm_vars false).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tailored_avsr_tpu.ops.masking import make_valid_mask


class UtteranceMVN(nn.Module):
    norm_means: bool = True
    norm_vars: bool = False
    eps: float = 1.0e-20

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        """(B, T, F), (B,) -> normalized over the valid frames of each utterance."""
        mask = make_valid_mask(lengths, x.shape[1])[..., None].astype(x.dtype)
        n = jnp.maximum(lengths.astype(x.dtype), 1.0)[:, None, None]
        mean = jnp.sum(x * mask, axis=1, keepdims=True) / n
        if self.norm_means:
            x = (x - mean) * mask
        if self.norm_vars:
            var = jnp.sum(((x if self.norm_means else x - mean) ** 2) * mask, axis=1, keepdims=True) / n
            std = jnp.maximum(jnp.sqrt(var), self.eps)
            x = x / std * mask
        return x, lengths


class GlobalMVN(nn.Module):
    """Normalize with corpus-level statistics held as (non-trainable) variables."""

    feature_size: int
    norm_means: bool = True
    norm_vars: bool = True
    eps: float = 1.0e-20

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        mean = self.variable(
            "stats", "mean", lambda: jnp.zeros((self.feature_size,), jnp.float32)
        ).value
        std = self.variable(
            "stats", "std", lambda: jnp.ones((self.feature_size,), jnp.float32)
        ).value
        mask = make_valid_mask(lengths, x.shape[1])[..., None].astype(x.dtype)
        # stats buffers are f32; normalize in the input's compute dtype so a
        # bf16 graph is not silently promoted back to f32 here
        mean = mean.astype(x.dtype)
        std = std.astype(x.dtype)
        if self.norm_means:
            x = (x - mean) * mask
        if self.norm_vars:
            x = x / jnp.maximum(std, self.eps) * mask
        return x, lengths
