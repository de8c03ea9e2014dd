"""Transformer language model for shallow fusion and LM training.

Capability parity with espnet's ``LMTask`` Transformer LM as used by the
reference (/root/reference/lm_main.py, configs/LM/lm-spanish.yaml: 16 layers,
512 att units, 8 heads, 2048 linear units, ``embed_unit: 128``,
``pos_enc: null``): token embed (``embed_unit``-d) -> input stack
Linear(att_unit) + LayerNorm + Dropout + ReLU (espnet Encoder
``input_layer="linear"``) -> optional sinusoidal pos-enc (the reference config
disables it) -> N x (causal self-attn + FFN, pre-norm) -> LayerNorm -> vocab
projection. With ``embed_unit=None`` the input stack is skipped and tokens
embed directly at ``att_unit`` (compact variant used by unit tests).
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
    # espnet TransformerLM embed_unit (reference configs/LM/*.yaml: 128):
    # the token embedding is embed_unit-d, projected to att_unit by the
    # encoder input stack. None = embed directly at att_unit (no stack).
    embed_unit: int | None = None
    # espnet TransformerLM pos_enc: None (reference default) = no positional
    # encoding at all; "sinusoidal" = absolute sinusoidal pos-enc.
    pos_enc: str | None = "sinusoidal"

    def setup(self):
        if self.pos_enc not in (None, "sinusoidal"):
            raise NotImplementedError(
                f"lm_conf pos_enc={self.pos_enc!r}: espnet TransformerLM "
                "supports only null (none) or 'sinusoidal'"
            )
        self.embed_tok = nn.Embed(
            self.vocab_size, self.embed_unit or self.att_unit, name="embed_tok"
        )
        if self.embed_unit:
            # espnet Encoder input_layer="linear": Linear + LN + Dropout + ReLU
            self.in_linear = nn.Dense(self.att_unit, name="in_linear")
            self.in_norm = nn.LayerNorm(name="in_norm")
            self.in_dropout = nn.Dropout(self.dropout_rate)
        self.posenc = AbsolutePositionalEncoding(self.positional_dropout_rate)
        self.layers = [
            TransformerLMLayer(
                self.att_unit, self.head, self.unit, self.dropout_rate,
                name=f"layer_{i}",
            )
            for i in range(self.layer)
        ]
        self.after_norm = nn.LayerNorm(name="after_norm")
        self.output_layer = nn.Dense(self.vocab_size, name="output_layer")

    def _embed_in(self, tokens: jnp.ndarray, deterministic: bool = True):
        """Token ids -> att_unit features (embed + input stack, NO pos-enc)."""
        x = self.embed_tok(tokens)
        if self.embed_unit:
            x = nn.relu(self.in_dropout(
                self.in_norm(self.in_linear(x)), deterministic=deterministic
            ))
        return x

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
        x = self._embed_in(tokens, deterministic)
        if self.pos_enc is not None:
            x = self.posenc(x, deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, mask, deterministic=deterministic)
        return self.output_layer(self.after_norm(x))

    def score_step(self, ys: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """Log-probs of the token at position ``pos`` given ys[:, :pos]
        (fixed-size buffer, for jitted shallow fusion)."""
        b, t = ys.shape
        mask = causal_mask(b, t) & (jnp.arange(t)[None, None, :] < pos)
        x = self._embed_in(ys)
        if self.pos_enc is not None:
            x = self.posenc(x, deterministic=True)
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
        """Per-layer (K, V) tensors, each (N, H, Lc, dk), N leading.

        Kept as separate contiguous tensors (NOT one stacked buffer): the
        per-step update/attend touch one layer at a time, and a stacked
        layout makes those reads/writes strided — measured 35% slower on the
        decoder cache. The beam loop's per-step reorder is a plain flat
        gather per leaf (``decode.beam_search.reorder_beam_rows``), which at
        this leaf size runs at HBM bandwidth; only a single multi-GB stacked
        buffer makes the gather lowering pathological.
        """
        d, h = self.att_unit, self.head
        dk = d // h
        return [
            (
                jnp.zeros((n, h, max_len, dk), dtype),
                jnp.zeros((n, h, max_len, dk), dtype),
            )
            for _ in range(self.layer)
        ]

    def init_cache_group(self, b: int, beam: int, max_len: int,
                         dtype=jnp.float32, quantized: bool = False):
        """Group-major (B, H, beam, Lc, dk) per-layer (K, V) tensors for the
        ancestry-cache beam protocol (see TransformerDecoder.init_cache_group;
        Lc rounded to a multiple of 8 for the Pallas block-write kernel)."""
        d, h = self.att_unit, self.head
        dk = d // h
        if quantized:
            # int8 payload + per-column scales (ops/kv_quant.py); Lc rounds
            # to 32 for the int8 sublane tile (ops/cache_update._blk)
            lc = -(-max_len // 32) * 32
            side = lambda: (
                jnp.zeros((b, h, beam, lc, dk), jnp.int8),
                jnp.zeros((b, h, beam, lc), jnp.float32),
            )
            return [(side(), side()) for _ in range(self.layer)]
        lc = -(-max_len // 8) * 8
        return [
            (
                jnp.zeros((b, h, beam, lc, dk), dtype),
                jnp.zeros((b, h, beam, lc, dk), dtype),
            )
            for _ in range(self.layer)
        ]

    def score_step_cached(self, ys: jnp.ndarray, pos: jnp.ndarray, cache):
        """Returns ((N, V) log-probs of the token at ``pos``, updated cache)."""
        n, l = ys.shape
        lc = cache[0][0].shape[2]
        tok = jnp.take_along_axis(
            ys, jnp.clip(pos - 1, 0, l - 1)[None, None].repeat(n, 0), axis=1
        )  # (N, 1)
        x = self._embed_in(tok)
        if self.pos_enc is not None:
            x = self.posenc.at_position(x, pos - 1, lc)
        self_mask = (jnp.arange(lc)[None, :] < pos).repeat(n, 0)  # (N, Lc)
        new_cache = []
        for layer, (ck, cv) in zip(self.layers, cache):
            h = layer.norm1(x)
            k_new, v_new = layer.self_attn.project_kv(h)
            ck = jax.lax.dynamic_update_slice_in_dim(
                ck, k_new.astype(ck.dtype), pos - 1, axis=2
            )
            cv = jax.lax.dynamic_update_slice_in_dim(
                cv, v_new.astype(cv.dtype), pos - 1, axis=2
            )
            x = x + layer.self_attn.attend_kv(h, ck, cv, self_mask)
            h = layer.norm2(x)
            x = x + layer.feed_forward(h, deterministic=True)
            new_cache.append((ck, cv))
        logits = self.output_layer(self.after_norm(x))
        return (
            jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1),
            new_cache,
        )

    def score_step_append(self, ys: jnp.ndarray, pos: jnp.ndarray, cache):
        """Cache-READ-ONLY beam-step scorer: ((N, V) log-probs, new_kv).

        Like ``score_step_cached`` but the step's K/V column is RETURNED
        (``new_kv``: per-layer ((N,H,1,dk), (N,H,1,dk))) instead of written
        into the cache; attention runs over the cached columns (< pos-1) plus
        the appended column (``attend_kv_append``). The beam loop folds the
        write into its reorder gather (``insert_permute_rows``) — removing
        the per-layer dynamic-update-slice that costs a full cache
        materialization per step inside the while loop.
        """
        n, l = ys.shape
        lc = cache[0][0].shape[2]
        tok = jnp.take_along_axis(
            ys, jnp.clip(pos - 1, 0, l - 1)[None, None].repeat(n, 0), axis=1
        )  # (N, 1)
        x = self._embed_in(tok)
        if self.pos_enc is not None:
            x = self.posenc.at_position(x, pos - 1, lc)
        cache_mask = (jnp.arange(lc)[None, :] < pos - 1).repeat(n, 0)  # (N, Lc)
        new_kv = []
        for layer, (ck, cv) in zip(self.layers, cache):
            h = layer.norm1(x)
            q, k_new, v_new = layer.self_attn.project_qkv(h)
            x = x + layer.self_attn.attend_kv_append(
                h, ck, cv, k_new, v_new, cache_mask, q_heads=q
            )
            h = layer.norm2(x)
            x = x + layer.feed_forward(h, deterministic=True)
            new_kv.append((k_new, v_new))
        logits = self.output_layer(self.after_norm(x))
        return (
            jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1),
            new_kv,
        )

    def score_step_anc(self, ys, pos, cache, anc, beam: int,
                       width: int | None = None,
                       fused: bool | None = None, mesh=None):
        """Ancestry-cache beam-step scorer: ((N, V) log-probs, new_kv).

        Like ``score_step_append`` but the cache (group-major
        (B, H, beam, Lc, dk), ``init_cache_group``) is never reordered by the
        beam loop; attention resolves each history column through the
        (N, Lc) ``anc`` table instead (``MultiHeadedAttention.attend_kv_anc``).
        The step's K/V column is returned for the loop to write at its own
        slot — the only per-step cache write is one column per leaf.
        """
        n, l = ys.shape
        ck0 = cache[0][0]
        # int8 cache sides are (payload, per-column scale) tuples
        lc = (ck0[0] if isinstance(ck0, tuple) else ck0).shape[3]
        tok = jnp.take_along_axis(
            ys, jnp.clip(pos - 1, 0, l - 1)[None, None].repeat(n, 0), axis=1
        )  # (N, 1)
        x = self._embed_in(tok)
        if self.pos_enc is not None:
            x = self.posenc.at_position(x, pos - 1, lc)
        new_kv = []
        for layer, (ck, cv) in zip(self.layers, cache):
            h = layer.norm1(x)
            q, k_new, v_new = layer.self_attn.project_qkv(h)
            x = x + layer.self_attn.attend_kv_anc(
                ck, cv, k_new, v_new, anc, pos, beam, q, width=width,
                fused=fused, mesh=mesh,
            )
            h = layer.norm2(x)
            x = x + layer.feed_forward(h, deterministic=True)
            new_kv.append((k_new, v_new))
        logits = self.output_layer(self.after_norm(x))
        return (
            jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1),
            new_kv,
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
