"""Weight-only model quantization for inference decoding.

Capability parity with the reference's dynamic-quantization options
(``quantize_asr_model`` / ``quantize_lm`` / ``quantize_dtype`` /
``quantize_modules`` — /root/reference/src/inference/avsr_inference.py:100-139,
torch.quantization.quantize_dynamic over nn.Linear). The TPU-native form is
weight-only quantization of Dense/Embed kernels: parameters are stored and
shipped host->device as int8 (per-output-channel symmetric scales) or
bfloat16, and dequantized INSIDE the jitted decode graph — so HBM parameter
residency and host->device transfer shrink 4x (int8) while matmuls still run
in the compute dtype. Activation quantization is not used (torch's dynamic
scheme quantizes activations per batch on CPU; on TPU bf16 activations are
already the fast path).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

import flax


_QKEY = "__quantized_leaves__"


def _should_quantize(path: str, leaf, min_size: int) -> bool:
    name = path.rsplit("/", 1)[-1]
    return (
        name in ("kernel", "embedding")
        and hasattr(leaf, "ndim")
        and leaf.ndim >= 2
        and leaf.dtype in (jnp.float32, jnp.bfloat16)
        and leaf.size >= min_size
    )


def quantize_variables(
    variables, dtype: str = "qint8", min_size: int = 4096
) -> Dict[str, Any]:
    """Split a variables pytree into quantized kernels + the float rest.

    dtype 'qint8' -> int8 payload + per-output-channel f32 scales;
    dtype 'float16'/'bfloat16' -> bfloat16 payload (TPU-native half).
    Returns a container dict consumed by :func:`dequantize_variables`.
    """
    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    q: Dict[str, Any] = {}
    scales: Dict[str, Any] = {}
    rest: Dict[str, Any] = {}
    for path, leaf in flat.items():
        if not _should_quantize(path, leaf, min_size):
            rest[path] = leaf
            continue
        if dtype == "qint8":
            w = jnp.asarray(leaf, jnp.float32)
            s = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
            s = jnp.maximum(s, 1e-12)
            q[path] = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
            # scale carries the original dtype so dequant restores it
            scales[path] = s.astype(leaf.dtype)
        elif dtype in ("float16", "bfloat16"):
            q[path] = jnp.asarray(leaf, jnp.bfloat16)
            scales[path] = jnp.ones((), jnp.bfloat16)
        else:
            raise ValueError(f"unknown quantize_dtype: {dtype}")
    return {_QKEY: {"q": q, "scale": scales}, "rest": rest}


def is_quantized(variables) -> bool:
    return isinstance(variables, dict) and _QKEY in variables


def dequantize_variables(variables, compute_dtype=None):
    """Rebuild the full variables pytree (inside jit: XLA keeps the int8
    payload in HBM and emits the dequantize as device ops). No-op on
    unquantized trees."""
    if not is_quantized(variables):
        return variables
    pack = variables[_QKEY]
    flat = dict(variables["rest"])
    for path, payload in pack["q"].items():
        s = pack["scale"][path]
        if payload.dtype == jnp.int8:
            w = (payload.astype(jnp.float32) * s.astype(jnp.float32)).astype(
                s.dtype
            )
        else:
            w = payload  # bf16 weight-halving mode: compute in bf16
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        flat[path] = w
    return flax.traverse_util.unflatten_dict(flat, sep="/")
