"""CTC head: encoder features -> vocabulary logits (+ loss wrapper).

Capability parity with /root/reference/src/ctc/ctc.py (Linear d->V with input
dropout; 'builtin' loss with zero-infinity semantics and batch-mean reduction;
softmax/log_softmax/argmax helpers used for interCTC conditioning and greedy
decoding). The loss DP is optax's native JAX CTC (see ops/losses.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.losses import ctc_loss


class CTCHead(nn.Module):
    vocab_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, D) -> (B, T, V) logits."""
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(self.vocab_size, name="ctc_lo")(x)

    def loss(
        self,
        x: jnp.ndarray,
        lengths: jnp.ndarray,
        labels: jnp.ndarray,
        label_lengths: jnp.ndarray,
        *,
        deterministic: bool = True,
        reduce: bool = True,
    ) -> jnp.ndarray:
        logits = self(x, deterministic=deterministic)
        return ctc_loss(logits, lengths, labels, label_lengths, reduce=reduce)

    def softmax(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.softmax(self(x), axis=-1)

    def log_softmax(self, x: jnp.ndarray) -> jnp.ndarray:
        # f32 log-probs even in a bf16 graph: these feed the CTC prefix
        # scorer's log-space DP, which accumulates over hundreds of frames
        return jax.nn.log_softmax(self(x).astype(jnp.float32), axis=-1)

    def argmax(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(self(x), axis=-1)
