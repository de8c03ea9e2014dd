"""Position-wise feed-forward and activations.

Capability parity with espnet's ``PositionwiseFeedForward`` / ``get_activation``
as consumed by the reference (e.g. /root/reference/src/encoder/branchformer/
encoder.py:45-47, src/audiovisual_fusion/adaptive_audiovisual_fusion.py:66).
Implemented as a plain flax module; XLA fuses the bias+activation into the
surrounding matmuls on TPU, so no Pallas needed here.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    table = {
        "relu": nn.relu,
        # exact (erf) form: torch nn.GELU() default, which the reference uses;
        # flax's default approximate=True (tanh) drifts ~1e-3 per activation
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "swish": nn.silu,
        "silu": nn.silu,
        "selu": nn.selu,
        "tanh": jnp.tanh,
        "identity": lambda x: x,
        "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
        "sigmoid": nn.sigmoid,
    }
    if name not in table:
        raise ValueError(f"unknown activation: {name}")
    return table[name]


class PositionwiseFeedForward(nn.Module):
    """d_model -> hidden -> activation -> dropout -> d_model."""

    hidden_units: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    output_size: int | None = None  # defaults to input size

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        d_out = self.output_size if self.output_size is not None else x.shape[-1]
        act = get_activation(self.activation)
        h = nn.Dense(self.hidden_units, name="w_1")(x)
        h = act(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d_out, name="w_2")(h)
