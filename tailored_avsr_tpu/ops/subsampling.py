"""Convolutional subsampling stacks for the audio feature stream.

Capability parity with espnet's ``Conv2dSubsampling{,1,2,6,8}`` /
``Conv1dSubsampling{2,3}`` / ``Conv2dSubsamplingWOPosEnc`` as selected by the
reference encoders and AV embedding (/root/reference/src/encoder/branchformer/
encoder.py:122-203, src/embedding_for_avsr/default.py:63-70).

Positional encoding is *not* fused in here (unlike espnet): the reference's AVSR
embedding layer needs the split apply-embed / apply-pos-enc API so both streams
share one positional index space; callers compose pos-enc explicitly.

All convs are VALID (no padding), stride/kernel per factor, matching the
reference's length arithmetic exactly (see ``subsampled_length``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# factor -> list of (kernel, stride) conv stages
_CONV2D_STAGES = {
    1: [(3, 1), (3, 1)],
    2: [(3, 2), (3, 1)],
    4: [(3, 2), (3, 2)],
    6: [(3, 2), (5, 3)],
    8: [(3, 2), (3, 2), (3, 2)],
}


def _stage_len(length, kernel, stride):
    return (length - kernel) // stride + 1


def subsampled_length(length, factor: int, conv1d: bool = False):
    """Output length after the VALID conv stack (works on ints or arrays)."""
    stages = _CONV1D_STAGES[factor] if conv1d else _CONV2D_STAGES[factor]
    for k, s in stages:
        length = _stage_len(length, k, s)
    return length


class Conv2dSubsampling(nn.Module):
    """(B, T, F) -> (B, T', D) via 2-D convs over (time, freq) + Dense.

    ``factor`` in {1, 2, 4, 6, 8}; factor 4 is the reference default (two
    kernel-3 stride-2 stages, then Dense over flattened channels x freq).
    """

    output_size: int
    factor: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stages = _CONV2D_STAGES[self.factor]
        h = x[..., None]  # (B, T, F, 1) — NHWC with H=time, W=freq
        for i, (k, s) in enumerate(stages):
            h = nn.Conv(
                features=self.output_size,
                kernel_size=(k, k),
                strides=(s, s),
                padding="VALID",
                name=f"conv_{i}",
            )(h)
            h = nn.relu(h)
        b, t, f, c = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)  # channel-major like torch
        return nn.Dense(self.output_size, name="out")(h)


_CONV1D_STAGES = {
    2: [(3, 2)],
    3: [(5, 3)],
}


class Conv1dSubsampling(nn.Module):
    """(B, T, F) -> (B, T', D) via a 1-D conv over time (factor 2 or 3)."""

    output_size: int
    factor: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        (k, s), = _CONV1D_STAGES[self.factor]
        h = nn.Conv(
            features=self.output_size,
            kernel_size=(k,),
            strides=(s,),
            padding="VALID",
            name="conv_0",
        )(x)
        return nn.relu(h)
