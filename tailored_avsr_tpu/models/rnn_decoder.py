"""RNN (LSTM) attention decoder — the espnet 'rnn' decoder choice.

Capability parity with espnet's ``RNNDecoder`` as registered by the
reference's ASR task (/root/reference/src/tasks/asr.py:176-194, choice
'rnn'): embedding -> stacked LSTM with a location-aware additive attention
context concatenated to each input -> vocabulary projection.

Location-aware attention (Chorowski et al.): the previous step's attention
weights are convolved and folded into the additive score,
    e_t = v^T tanh(W_q s_{t-1} + W_k h + W_f conv1d(a_{t-1})),
which biases the alignment to move monotonically.

Interface-compatible with TransformerDecoder's training/scoring contract:
``__call__(memory, memory_mask, ys_in, ys_in_lengths)`` for teacher forcing
and ``score_step(memory, memory_mask, ys, pos)`` for the jitted beam search
(full-prefix recompute via nn.scan over the fixed token buffer — the
stateful KV-cache fast path stays transformer-only). The recurrence is an
``nn.scan`` (one traced step, params broadcast), not an unrolled loop.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class _RNNAttStep(nn.Module):
    """One decode step: location-aware attention + stacked LSTM cells."""

    hidden_size: int
    num_layers: int
    att_dim: int
    aconv_chans: int
    aconv_filts: int

    @nn.compact
    def __call__(self, carry, memory, enc_proj, memory_mask, x_t):
        states, att_prev = carry
        # espnet AttLoc queries with the FIRST layer's previous hidden
        # (rnn/decoders.py z_list[0]), not the top layer's
        dec_state = states[0][1]
        # location feature from the previous alignment
        f = nn.Conv(
            self.aconv_chans,
            kernel_size=(2 * self.aconv_filts + 1,),
            padding="SAME",
            use_bias=False,
            name="loc_conv",
        )(att_prev[..., None])  # (B, T, chans)
        f = nn.Dense(self.att_dim, use_bias=False, name="mlp_att")(f)
        q = nn.Dense(self.att_dim, use_bias=False, name="mlp_dec")(dec_state)
        e = nn.Dense(1, use_bias=False, name="gvec")(
            nn.tanh(q[:, None] + enc_proj + f)
        ).squeeze(-1)  # (B, T)
        if memory_mask is not None:
            e = jnp.where(memory_mask, e, -1e10)
        # espnet AttLoc sharpening factor (scaling=2.0) before the softmax
        w = jax.nn.softmax(2.0 * e.astype(jnp.float32), axis=-1).astype(
            memory.dtype
        )
        if memory_mask is not None:
            w = jnp.where(memory_mask, w, 0.0)
        ctx = jnp.einsum("bt,btd->bd", w, memory)

        h = jnp.concatenate([x_t, ctx], axis=-1)
        new_states = []
        for i, st in enumerate(states):
            st, h = nn.OptimizedLSTMCell(self.hidden_size, name=f"lstm_{i}")(st, h)
            new_states.append(st)
        return (tuple(new_states), w), h


class RNNDecoder(nn.Module):
    vocab_size: int
    encoder_output_size: int = 256
    hidden_size: int = 320
    num_layers: int = 1
    dropout_rate: float = 0.0
    att_dim: int = 320
    aconv_chans: int = 10
    aconv_filts: int = 100
    layer_variant: str = "rnn"  # inference.py dispatch: no KV-cache fast path

    def setup(self):
        self.embed_tok = nn.Embed(
            self.vocab_size, self.hidden_size, name="embed_tok"
        )
        self.enc_proj = nn.Dense(self.att_dim, use_bias=False, name="mlp_enc")
        self.output_layer = nn.Dense(self.vocab_size, name="output_layer")
        self.dropout = nn.Dropout(self.dropout_rate)
        self.scan_step = nn.scan(
            _RNNAttStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, 1),
            out_axes=1,
        )(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            att_dim=self.att_dim,
            aconv_chans=self.aconv_chans,
            aconv_filts=self.aconv_filts,
            name="step",
        )

    def _decode_all(self, memory, memory_mask, ys_in, deterministic):
        """Run the full teacher-forced recurrence; returns (B, L, V) logits."""
        b, _ = ys_in.shape
        t = memory.shape[1]
        emb = self.dropout(self.embed_tok(ys_in), deterministic=deterministic)
        enc_proj = self.enc_proj(memory)  # (B, T, att)

        init_states = tuple(
            (
                jnp.zeros((b, self.hidden_size), memory.dtype),
                jnp.zeros((b, self.hidden_size), memory.dtype),
            )
            for _ in range(self.num_layers)
        )
        att0 = (
            memory_mask.astype(memory.dtype)
            / jnp.maximum(memory_mask.sum(-1, keepdims=True), 1)
            if memory_mask is not None
            else jnp.full((b, t), 1.0 / t, memory.dtype)
        )
        _, hs = self.scan_step(
            (init_states, att0), memory, enc_proj, memory_mask, emb
        )  # hs: (B, L, H)
        hs = self.dropout(hs, deterministic=deterministic)
        return self.output_layer(hs)

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
        return self._decode_all(memory, memory_mask, ys_in, deterministic)

    def score_step(
        self,
        memory: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
        ys: jnp.ndarray,  # (B, Lmax) fixed buffer
        pos: jnp.ndarray,  # scalar: position being generated
    ) -> jnp.ndarray:
        """Log-probs of the token AT ``pos`` (full-prefix recompute)."""
        logits = self._decode_all(memory, memory_mask, ys, True)  # (B, L, V)
        b = ys.shape[0]
        step_logits = jnp.take_along_axis(
            logits, (pos - 1)[None, None, None].repeat(b, 0), axis=1
        ).squeeze(1)
        return jax.nn.log_softmax(step_logits.astype(jnp.float32), axis=-1)
