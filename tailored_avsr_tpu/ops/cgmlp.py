"""Convolutional Gating MLP (cgMLP) — the Branchformer "local" branch.

Capability parity with espnet's ``ConvolutionalGatingMLP`` as used by every
Branchformer/Tailored layer in the reference (/root/reference/src/encoder/
branchformer/encoder.py:18,261-270; src/encoder/audiovisual/tailored/
encoder.py:155-164).

Structure: Dense(d -> units) + GELU -> CSGU -> Dense(units/2 -> d), where CSGU
splits channels in half, LayerNorms + depthwise-convolves the gate half
(kernel 31, 'same' padding), optional Dense after the conv, gate activation
(identity by default), and multiplies elementwise.

TPU-first: the depthwise conv is expressed as a feature-grouped
``lax.conv_general_dilated`` in NTC layout which XLA lowers to efficient
TPU convolutions; the surrounding Dense layers dominate FLOPs and hit the MXU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tailored_avsr_tpu.ops.feedforward import get_activation


class ConvolutionalSpatialGatingUnit(nn.Module):
    kernel_size: int = 31
    dropout_rate: float = 0.0
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        half = x.shape[-1] // 2
        x_r, x_g = x[..., :half], x[..., half:]
        x_g = nn.LayerNorm(name="norm")(x_g)
        # depthwise conv along time: feature_group_count == channels
        x_g = nn.Conv(
            features=half,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            feature_group_count=half,
            name="conv",
        )(x_g)
        if self.use_linear_after_conv:
            x_g = nn.Dense(half, name="linear")(x_g)
        x_g = get_activation(self.gate_activation)(x_g)
        out = x_r * x_g
        return nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)


class ConvolutionalGatingMLP(nn.Module):
    linear_units: int = 2048
    kernel_size: int = 31
    dropout_rate: float = 0.0
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,  # kept for API symmetry; conv is unmasked
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d = x.shape[-1]
        h = nn.Dense(self.linear_units, name="channel_proj1")(x)
        h = nn.gelu(h)
        h = ConvolutionalSpatialGatingUnit(
            kernel_size=self.kernel_size,
            dropout_rate=self.dropout_rate,
            use_linear_after_conv=self.use_linear_after_conv,
            gate_activation=self.gate_activation,
            name="csgu",
        )(h, deterministic=deterministic)
        return nn.Dense(d, name="channel_proj2")(h)
