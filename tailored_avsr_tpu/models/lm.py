"""Transformer language model for shallow fusion and LM training.

Capability parity with espnet's ``LMTask`` Transformer LM as used by the
reference (/root/reference/lm_main.py, configs/LM/lm-spanish.yaml: 16 layers,
512 att units, 8 heads, 2048 linear units): token embed + abs pos-enc ->
N x (causal self-attn + FFN, pre-norm) -> LayerNorm -> vocab projection.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.models.decoder import causal_mask
from tailored_avsr_tpu.ops.attention import MultiHeadedAttention
from tailored_avsr_tpu.ops.feedforward import PositionwiseFeedForward
from tailored_avsr_tpu.ops.posenc import AbsolutePositionalEncoding


class TransformerLMLayer(nn.Module):
    size: int
    attention_heads: int = 8
    linear_units: int = 2048
    dropout_rate: float = 0.1

    def setup(self):
        self.self_attn = MultiHeadedAttention(
            self.attention_heads, self.dropout_rate, self.size, name="self_attn"
        )
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, "relu", name="feed_forward"
        )
        self.norm1 = nn.LayerNorm()
        self.norm2 = nn.LayerNorm()
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x, mask, *, deterministic=True):
        h = self.norm1(x)
        x = x + self.dropout(
            self.self_attn(h, h, h, mask, deterministic=deterministic),
            deterministic=deterministic,
        )
        h = self.norm2(x)
        x = x + self.dropout(
            self.feed_forward(h, deterministic=deterministic),
            deterministic=deterministic,
        )
        return x


class TransformerLM(nn.Module):
    vocab_size: int
    att_unit: int = 512
    head: int = 8
    unit: int = 2048
    layer: int = 16
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1

    def setup(self):
        self.embed_tok = nn.Embed(self.vocab_size, self.att_unit, name="embed_tok")
        self.pos_enc = AbsolutePositionalEncoding(self.positional_dropout_rate)
        self.layers = [
            TransformerLMLayer(
                self.att_unit, self.head, self.unit, self.dropout_rate,
                name=f"layer_{i}",
            )
            for i in range(self.layer)
        ]
        self.after_norm = nn.LayerNorm(name="after_norm")
        self.output_layer = nn.Dense(self.vocab_size, name="output_layer")

    def __call__(
        self,
        tokens: jnp.ndarray,
        lengths: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """(B, T) token ids -> (B, T, V) next-token logits."""
        b, t = tokens.shape
        mask = causal_mask(b, t, lengths)
        x = self.pos_enc(self.embed_tok(tokens), deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, mask, deterministic=deterministic)
        return self.output_layer(self.after_norm(x))

    def score_step(self, ys: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """Log-probs of the token at position ``pos`` given ys[:, :pos]
        (fixed-size buffer, for jitted shallow fusion)."""
        b, t = ys.shape
        mask = causal_mask(b, t) & (jnp.arange(t)[None, None, :] < pos)
        x = self.pos_enc(self.embed_tok(ys), deterministic=True)
        for layer in self.layers:
            x = layer(x, mask, deterministic=True)
        logits = self.output_layer(self.after_norm(x))
        step = jnp.take_along_axis(
            logits, (pos - 1)[None, None, None].repeat(b, 0), axis=1
        ).squeeze(1)
        return jax.nn.log_softmax(step.astype(jnp.float32), axis=-1)

    # ---- KV-cache fast path (jitted beam-search shallow fusion) ------------
    # Mirrors TransformerDecoder.score_step_cached: without it, fusing the
    # 16-layer LM costs a full-prefix recompute per beam step (~1 TFLOP/step
    # at beam dims), dwarfing the ASR decoder itself.

    def init_cache(self, n: int, max_len: int, dtype=jnp.float32):
        """Single stacked K/V buffer (N, layers, 2, H, Lc, dk).

        One tensor instead of ``layers x 2``: the beam loop reorders the cache
        with a row gather every step, and 32 separate gathers of ~67 MB each
        defeat XLA's in-place buffer chain — one gather of the stacked buffer
        is a single fused HLO with N leading so generic ``x[g_src]`` reorder
        (tree_map in the beam) does the right thing.
        """
        d, h = self.att_unit, self.head
        dk = d // h
        return jnp.zeros((n, self.layer, 2, h, max_len, dk), dtype)

    def score_step_cached(self, ys: jnp.ndarray, pos: jnp.ndarray, cache):
        """Returns ((N, V) log-probs of the token at ``pos``, updated cache)."""
        n, l = ys.shape
        lc = cache.shape[4]
        tok = jnp.take_along_axis(
            ys, jnp.clip(pos - 1, 0, l - 1)[None, None].repeat(n, 0), axis=1
        )  # (N, 1)
        x = self.embed_tok(tok)
        x = self.pos_enc.at_position(x, pos - 1, lc)
        self_mask = (jnp.arange(lc)[None, :] < pos).repeat(n, 0)  # (N, Lc)
        for li, layer in enumerate(self.layers):
            h = layer.norm1(x)
            k_new, v_new = layer.self_attn.project_kv(h)  # (N, H, 1, dk)
            kv = jnp.stack([k_new, v_new], axis=1)[:, None]  # (N, 1, 2, H, 1, dk)
            cache = jax.lax.dynamic_update_slice(
                cache, kv.astype(cache.dtype),
                (0, li, 0, 0, pos - 1, 0),
            )
            x = x + layer.self_attn.attend_kv(
                h, cache[:, li, 0], cache[:, li, 1], self_mask
            )
            h = layer.norm2(x)
            x = x + layer.feed_forward(h, deterministic=True)
        logits = self.output_layer(self.after_norm(x))
        return (
            jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1),
            cache,
        )

    def nll(self, tokens, lengths, *, deterministic: bool = True):
        """Per-utterance NLL for perplexity (lm_main.py:45-57). Input tokens are
        <sos/eos>-free; we wrap with sos/eos internally like espnet LM.
        ``deterministic=False`` enables dropout (the TRAINING loss path)."""
        sos = eos = self.vocab_size - 1
        b, l = tokens.shape
        ys_in = jnp.concatenate(
            [jnp.full((b, 1), sos, tokens.dtype), jnp.where(tokens >= 0, tokens, eos)],
            axis=-1,
        )
        pos = jnp.arange(l + 1)[None, :]
        ys_out = jnp.concatenate(
            [jnp.where(tokens >= 0, tokens, 0), jnp.zeros((b, 1), tokens.dtype)], axis=-1
        )
        ys_out = jnp.where(pos == lengths[:, None], eos, ys_out)
        valid = pos <= lengths[:, None]
        logits = self(ys_in, lengths + 1, deterministic=deterministic)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_ll = jnp.take_along_axis(logp, ys_out[..., None], axis=-1).squeeze(-1)
        return -jnp.sum(tok_ll * valid, axis=-1), jnp.sum(valid, axis=-1)
