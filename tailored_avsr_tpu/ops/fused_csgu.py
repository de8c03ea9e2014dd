"""Pallas TPU fused Convolutional Spatial Gating Unit (cgMLP gate).

Fuses the CSGU chain — LayerNorm over channels, depthwise conv over time
(kernel k, SAME), gate activation, elementwise product with the residual half
— into one VMEM-resident kernel, so the (B, T, U/2) intermediates never
round-trip HBM (the XLA path materializes LN output and conv output
separately). The depthwise conv is computed as k shifted multiply-adds over
the time (sublane) axis inside VMEM.

Grid: one program per batch element; the full (T, C) gate tile lives in VMEM
(T<=500, C<=1024 fp32 ~ 2 MB — comfortably within the 16 MB budget).
Inference path (like the flash-attention kernel): the XLA implementation in
ops/cgmlp.py remains the training/reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _csgu_kernel(
    x_r_ref, x_g_ref, gamma_ref, beta_ref, w_ref, b_ref, o_ref,
    *, kernel_size: int, t: int,
):
    x_g = x_g_ref[0].astype(jnp.float32)  # (Tpad, C)
    # LayerNorm over channels
    mean = jnp.mean(x_g, axis=-1, keepdims=True)
    var = jnp.mean((x_g - mean) ** 2, axis=-1, keepdims=True)
    ln = (x_g - mean) * jax.lax.rsqrt(var + 1e-6)
    ln = ln * gamma_ref[0] + beta_ref[0]
    # zero out the padding rows so the conv halo reads zeros (SAME padding)
    tpad = ln.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (tpad, 1), 0)
    ln = jnp.where(row < t, ln, 0.0)
    # depthwise conv over time: k shifted multiply-adds
    half = (kernel_size - 1) // 2
    acc = jnp.zeros_like(ln) + b_ref[0]
    padded = jnp.pad(ln, ((half, half), (0, 0)))
    for j in range(kernel_size):  # static slices -> Mosaic strided_slice
        acc = acc + w_ref[0, j] * padded[j : j + tpad, :]
    gate = acc  # identity gate activation (reference default)
    o_ref[0] = (x_r_ref[0].astype(jnp.float32) * gate).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _csgu_call(b: int, tpad: int, c: int, k: int, t: int, dtype, interpret: bool):
    """Memoized pallas_call instance: every layer with the same shapes shares
    ONE kernel closure, so tracing produces identical primitive params and the
    lowered Mosaic payloads are byte-identical across call sites — a
    prerequisite for compile-cache hits (the flagship has 24 cgMLP sites)."""
    return pl.pallas_call(
        functools.partial(_csgu_kernel, kernel_size=k, t=t),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tpad, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, tpad, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, k, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tpad, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tpad, c), dtype),
        interpret=interpret,
    )


def _csgu_core(
    x: jnp.ndarray,  # (B, T, U) — the channel_proj1+GELU output
    gamma: jnp.ndarray,  # (U/2,) LN scale
    beta: jnp.ndarray,  # (U/2,) LN bias
    conv_w: jnp.ndarray,  # (k, 1, U/2) depthwise kernel (flax layout)
    conv_b: jnp.ndarray,  # (U/2,)
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, u = x.shape
    c = u // 2
    k = conv_w.shape[0]
    x_r, x_g = x[..., :c], x[..., c:]
    # pad T to the fp32 sublane multiple
    tpad = -(-t // 8) * 8
    if tpad != t:
        x_r = jnp.pad(x_r, ((0, 0), (0, tpad - t), (0, 0)))
        x_g = jnp.pad(x_g, ((0, 0), (0, tpad - t), (0, 0)))
    w = conv_w[:, 0, :][None]  # (1, k, C)
    call = _csgu_call(b, tpad, c, k, t, jnp.dtype(x.dtype), interpret)
    out = call(x_r, x_g, gamma[None], beta[None], w, conv_b[None])
    return out[:, :t, :]


from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402

from tailored_avsr_tpu.ops.flash_attention import _def_batch_partition  # noqa: E402

_csgu_p = custom_partitioning(_csgu_core, static_argnums=(5,))
_def_batch_partition(
    _csgu_p, _csgu_core,
    batch_dims=(0, None, None, None, None),
    rule="b t u, c, c, k o c, c -> b t c",
)


def fused_csgu(
    x: jnp.ndarray,  # (B, T, U) — the channel_proj1+GELU output
    gamma: jnp.ndarray,  # (U/2,) LN scale
    beta: jnp.ndarray,  # (U/2,) LN bias
    conv_w: jnp.ndarray,  # (k, 1, U/2) depthwise kernel (flax layout)
    conv_b: jnp.ndarray,  # (U/2,)
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, T, U/2) gated output; identity gate activation.

    Carries a batch-dim partitioning rule (see flash_attention's
    ``_def_batch_partition``): under a mesh the kernel runs per batch shard,
    parameters replicated."""
    return _csgu_p(x, gamma, beta, conv_w, conv_b, interpret)
