"""S4 (structured state-space) decoder — the espnet 's4' decoder choice.

Capability parity with espnet's ``S4Decoder`` as registered by the reference's
ASR task (/root/reference/src/tasks/asr.py:176-194, choice 's4'): an
autoregressive decoder whose causal sequence mixer is a state-space layer
instead of self-attention, with cross-attention over the encoder memory and a
feed-forward block per layer.

The sequence mixer is S4D (Gu et al., "On the Parameterization and
Initialization of Diagonal State Space Models", 2022): per channel c a
diagonal complex SSM

    h_k = Abar h_{k-1} + Bbar u_k,    y_k = 2 Re(C h_k) + D u_k,

ZOH-discretized with a learned per-channel timestep. TPU mapping: the SSM is
evaluated as a causal depthwise convolution with the kernel

    K[c, k] = 2 Re( sum_n C[c,n] Bbar[c,n] Abar[c,n]^k )

computed by a Vandermonde product (C_ch x N x T complex — small and fully
vectorized), then applied with one einsum over unfolded taps. No sequential
scan anywhere; causality is structural (kernel index k only looks back).
S4D-Lin initialization: A = -1/2 + i*pi*n, dt log-uniform in [1e-3, 1e-1].

Interface-compatible with TransformerDecoder's contract: ``__call__`` for
teacher forcing and ``score_step`` (full-prefix recompute) for the jitted
beam search.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.attention import MultiHeadedAttention
from tailored_avsr_tpu.ops.feedforward import PositionwiseFeedForward
from tailored_avsr_tpu.ops.posenc import AbsolutePositionalEncoding


class S4DLayer(nn.Module):
    """Diagonal SSM sequence mixer (causal, depthwise over channels)."""

    d_state: int = 64
    dt_min: float = 1e-3
    dt_max: float = 1e-1

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:  # (B, T, C)
        b, t, c = u.shape
        n = self.d_state

        def init_log_dt(key, shape):
            r = jax.random.uniform(key, shape)
            return r * (math.log(self.dt_max) - math.log(self.dt_min)) + math.log(
                self.dt_min
            )

        log_dt = self.param("log_dt", init_log_dt, (c,))
        # S4D-Lin: A_n = -1/2 + i pi n
        log_a_real = self.param(
            "log_A_real", lambda k, s: jnp.full(s, math.log(0.5)), (c, n)
        )
        a_imag = self.param(
            "A_imag",
            lambda k, s: jnp.broadcast_to(math.pi * jnp.arange(n), s).astype(
                jnp.float32
            ),
            (c, n),
        )
        c_re = self.param("C_re", nn.initializers.normal(0.5**0.5), (c, n))
        c_im = self.param("C_im", nn.initializers.normal(0.5**0.5), (c, n))
        d_skip = self.param("D", nn.initializers.ones, (c,))

        dt = jnp.exp(log_dt.astype(jnp.float32))[:, None]  # (C, 1)
        a = -jnp.exp(log_a_real.astype(jnp.float32)) + 1j * a_imag.astype(
            jnp.float32
        )  # (C, N)
        dt_a = dt * a
        a_bar = jnp.exp(dt_a)  # (C, N)
        # ZOH B_bar with B = 1: (exp(dt A) - 1) / A
        b_bar = (a_bar - 1.0) / a
        cc = c_re.astype(jnp.float32) + 1j * c_im.astype(jnp.float32)
        # Vandermonde kernel: K[ch, k] = 2 Re sum_n cc * b_bar * a_bar^k
        k_idx = jnp.arange(t)
        vander = jnp.exp(dt_a[:, :, None] * k_idx[None, None, :])  # (C, N, T)
        kernel = 2.0 * jnp.real(
            jnp.einsum("cn,cnt->ct", cc * b_bar, vander)
        )  # (C, T)

        # causal depthwise conv: y[i] = sum_{k<=i} K[c, k] u[i-k]  (+ D u[i]).
        # lax.conv cross-correlates, so flip the kernel and left-pad by T-1;
        # XLA streams the taps (no O(T^2) materialization).
        uf = u.astype(jnp.float32)
        y = jax.lax.conv_general_dilated(
            uf,
            kernel[:, ::-1].T[:, None, :],  # (T, 1, C) HIO, flipped
            window_strides=(1,),
            padding=[(t - 1, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=c,
        )
        y = y + uf * d_skip[None, None, :]
        return nn.silu(y).astype(u.dtype)


class S4Decoder(nn.Module):
    vocab_size: int
    encoder_output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    d_state: int = 64
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    src_attention_dropout_rate: float = 0.0
    layer_variant: str = "s4"  # inference.py dispatch: no KV-cache fast path

    def setup(self):
        d = self.encoder_output_size
        self.embed_tok = nn.Embed(self.vocab_size, d, name="embed_tok")
        self.pos_enc = AbsolutePositionalEncoding(self.positional_dropout_rate)
        self.s4_layers = [
            S4DLayer(self.d_state, name=f"s4_{i}") for i in range(self.num_blocks)
        ]
        self.src_attns = [
            MultiHeadedAttention(
                self.attention_heads, self.src_attention_dropout_rate, d,
                name=f"src_attn_{i}",
            )
            for i in range(self.num_blocks)
        ]
        self.ffns = [
            PositionwiseFeedForward(
                self.linear_units, self.dropout_rate, "relu", name=f"ffn_{i}"
            )
            for i in range(self.num_blocks)
        ]
        self.norms1 = [nn.LayerNorm() for _ in range(self.num_blocks)]
        self.norms2 = [nn.LayerNorm() for _ in range(self.num_blocks)]
        self.norms3 = [nn.LayerNorm() for _ in range(self.num_blocks)]
        self.after_norm = nn.LayerNorm(name="after_norm")
        self.output_layer = nn.Dense(self.vocab_size, name="output_layer")
        self.dropout = nn.Dropout(self.dropout_rate)

    def _run(self, memory, memory_mask, ys_in, deterministic):
        x = self.pos_enc(self.embed_tok(ys_in), deterministic=deterministic)
        for s4, attn, ffn, n1, n2, n3 in zip(
            self.s4_layers, self.src_attns, self.ffns,
            self.norms1, self.norms2, self.norms3,
        ):
            x = x + self.dropout(s4(n1(x)), deterministic=deterministic)
            x = x + self.dropout(
                attn(n2(x), memory, memory, memory_mask, deterministic=deterministic),
                deterministic=deterministic,
            )
            x = x + self.dropout(
                ffn(n3(x), deterministic=deterministic), deterministic=deterministic
            )
        return self.output_layer(self.after_norm(x))

    def __call__(
        self,
        memory: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
        ys_in: jnp.ndarray,
        ys_in_lengths: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        del ys_in_lengths  # padded positions are masked by the loss
        return self._run(memory, memory_mask, ys_in, deterministic)

    def score_step(
        self,
        memory: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
        ys: jnp.ndarray,
        pos: jnp.ndarray,
    ) -> jnp.ndarray:
        """Log-probs of the token AT ``pos`` (full-prefix recompute; the S4
        mixer is structurally causal so no masking is needed)."""
        logits = self._run(memory, memory_mask, ys, True)
        b = ys.shape[0]
        step_logits = jnp.take_along_axis(
            logits, (pos - 1)[None, None, None].repeat(b, 0), axis=1
        ).squeeze(1)
        return jax.nn.log_softmax(step_logits.astype(jnp.float32), axis=-1)
