"""Convolutional Gating MLP (cgMLP) — the Branchformer "local" branch.

Capability parity with espnet's ``ConvolutionalGatingMLP`` as used by every
Branchformer/Tailored layer in the reference (/root/reference/src/encoder/
branchformer/encoder.py:18,261-270; src/encoder/audiovisual/tailored/
encoder.py:155-164).

Structure: Dense(d -> units) + GELU -> CSGU -> Dense(units/2 -> d), where CSGU
splits channels in half, LayerNorms + depthwise-convolves the gate half
(kernel 31, 'same' padding), optional Dense after the conv, gate activation
(identity by default), and multiplies elementwise.

TPU-first: the CSGU declares its LayerNorm/conv parameters directly (same
tree layout as the module version, so torch-compat keys are unchanged) and
computes through either the XLA path (training/reference) or the Pallas fused
kernel in ops/fused_csgu.py (``use_fused``, inference) which keeps the LN and
conv intermediates in VMEM.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.feedforward import get_activation


class _NormParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class _DepthwiseConvParams(nn.Module):
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        # flax nn.Conv depthwise layout: (k, in_per_group=1, C)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class ConvolutionalSpatialGatingUnit(nn.Module):
    kernel_size: int = 31
    dropout_rate: float = 0.0
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"
    use_fused: bool = False  # Pallas fused LN+conv+gate (inference path)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        half = x.shape[-1] // 2
        x_r, x_g = x[..., :half], x[..., half:]
        gamma, beta = _NormParams(half, name="norm")()
        kernel, cbias = _DepthwiseConvParams(half, self.kernel_size, name="conv")()

        fused_ok = (
            self.use_fused
            and deterministic
            and not self.use_linear_after_conv
            and self.gate_activation == "identity"
        )
        if fused_ok:
            from tailored_avsr_tpu.ops.fused_csgu import fused_csgu

            out = fused_csgu(x, gamma, beta, kernel, cbias)
        else:
            xg32 = x_g.astype(jnp.float32)
            mean = jnp.mean(xg32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xg32 - mean), axis=-1, keepdims=True)
            ln = (xg32 - mean) * jax.lax.rsqrt(var + 1e-6)
            ln = (ln * gamma + beta).astype(x_g.dtype)
            conv = jax.lax.conv_general_dilated(
                ln,
                kernel.astype(ln.dtype),
                window_strides=(1,),
                padding="SAME",
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=half,
            ) + cbias.astype(ln.dtype)
            if self.use_linear_after_conv:
                conv = nn.Dense(half, name="linear")(conv)
            gate = get_activation(self.gate_activation)(conv)
            out = x_r * gate
        return nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)


class ConvolutionalGatingMLP(nn.Module):
    linear_units: int = 2048
    kernel_size: int = 31
    dropout_rate: float = 0.0
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"
    use_fused: bool = False

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
        h = nn.gelu(h, approximate=False)  # exact erf, matches torch GELU
        h = ConvolutionalSpatialGatingUnit(
            kernel_size=self.kernel_size,
            dropout_rate=self.dropout_rate,
            use_linear_after_conv=self.use_linear_after_conv,
            gate_activation=self.gate_activation,
            use_fused=self.use_fused,
            name="csgu",
        )(h, deterministic=deterministic)
        return nn.Dense(d, name="channel_proj2")(h)
