"""Decoders: AR Transformer, MLM (Mask-CTC), and the Sim-T shared-MHA variant.

Capability parity with:
- espnet ``TransformerDecoder`` (registered by /root/reference/src/tasks/
  avsr.py:52-59): token embed + abs pos-enc -> N x (self-attn with causal mask,
  cross-attn over encoder memory, FFN), pre-norm, final LayerNorm + output
  Dense to the vocabulary.
- espnet ``MLMDecoder`` (/root/reference/src/models/maskctc_model.py:14): same
  without causality, vocabulary + 1 for the <mask> token.
- Sim-T ``DecoderLayerSimT`` (/root/reference/src/decoder/sim_t/transformer/
  decoder_layer.py:60-189, arXiv:2304.04991): ONE shared MHA per layer serves
  self-attn, cross-attn, and a post-MHA that re-applies the FIRST layer's
  self-attention scores to freshly projected values; one shared FFN serves both
  FFN sub-blocks.

Decoding under jit recomputes the full prefix each step with a static max
length (score_step) — the tensorized beam search in decode/beam_search.py
builds on it. A KV-cache fast path can be layered underneath later without
changing this contract.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.attention import MultiHeadedAttention
from tailored_avsr_tpu.ops.feedforward import PositionwiseFeedForward
from tailored_avsr_tpu.ops.posenc import AbsolutePositionalEncoding


def causal_mask(b: int, t: int, lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, T, T) True where key j <= query i (and j < length if given)."""
    m = jnp.tril(jnp.ones((t, t), dtype=bool))[None]
    m = jnp.broadcast_to(m, (b, t, t))
    if lengths is not None:
        m = m & (jnp.arange(t)[None, None, :] < lengths[:, None, None])
    return m


class TransformerDecoderLayer(nn.Module):
    size: int
    attention_heads: int = 4
    linear_units: int = 2048
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    dropout_rate: float = 0.1

    def setup(self):
        self.self_attn = MultiHeadedAttention(
            self.attention_heads, self.self_attention_dropout_rate, self.size,
            name="self_attn",
        )
        self.src_attn = MultiHeadedAttention(
            self.attention_heads, self.src_attention_dropout_rate, self.size,
            name="src_attn",
        )
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, "relu", name="feed_forward"
        )
        self.norm1 = nn.LayerNorm()
        self.norm2 = nn.LayerNorm()
        self.norm3 = nn.LayerNorm()
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, tgt, tgt_mask, memory, memory_mask, *, deterministic=True):
        h = self.norm1(tgt)
        tgt = tgt + self.dropout(
            self.self_attn(h, h, h, tgt_mask, deterministic=deterministic),
            deterministic=deterministic,
        )
        h = self.norm2(tgt)
        tgt = tgt + self.dropout(
            self.src_attn(h, memory, memory, memory_mask, deterministic=deterministic),
            deterministic=deterministic,
        )
        h = self.norm3(tgt)
        tgt = tgt + self.dropout(
            self.feed_forward(h, deterministic=deterministic),
            deterministic=deterministic,
        )
        return tgt


class SimTDecoderLayer(nn.Module):
    """Parameter-efficient Sim-T layer: one MHA + one FFN reused."""

    size: int
    attention_heads: int = 4
    linear_units: int = 2048
    attention_dropout_rate: float = 0.0
    dropout_rate: float = 0.1

    def setup(self):
        self.mha_attn = MultiHeadedAttention(
            self.attention_heads, self.attention_dropout_rate, self.size,
            name="mha_attn",
        )
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, "relu", name="feed_forward"
        )
        self.norm_mha = nn.LayerNorm()
        self.norm_ffn = nn.LayerNorm()
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, tgt, tgt_mask, memory, memory_mask, s1, *, deterministic=True):
        # pre-MHA (self-attention)
        h = self.norm_mha(tgt)
        out, self_scores = self.mha_attn.attend(
            h, h, h, tgt_mask, deterministic=deterministic
        )
        x = tgt + self.dropout(out, deterministic=deterministic)
        if s1 is None:
            s1 = self_scores  # first layer donates its score matrix
        # MHA (cross-attention) — shares the same projections
        h = self.norm_mha(x)
        x = x + self.dropout(
            self.mha_attn(h, memory, memory, memory_mask, deterministic=deterministic),
            deterministic=deterministic,
        )
        # FFN
        h = self.norm_ffn(x)
        x = x + self.dropout(
            self.feed_forward(h, deterministic=deterministic), deterministic=deterministic
        )
        # post-MHA: re-apply layer-1 self-attn scores to fresh values
        h = self.norm_mha(x)
        x = x + self.mha_attn.apply_scores(h, s1, deterministic=deterministic)
        # FFN (shared weights again)
        h = self.norm_ffn(x)
        x = x + self.dropout(
            self.feed_forward(h, deterministic=deterministic), deterministic=deterministic
        )
        return x, s1


class ConvDecoderLayer(nn.Module):
    """Lightweight/dynamic-convolution decoder layer (Wu et al., ICLR 2019).

    Capability parity with espnet's ``LightweightConvolutionTransformerDecoder``
    / ``DynamicConvolutionTransformerDecoder`` (and their ``…2D`` twins)
    registered by the reference (/root/reference/src/tasks/asr.py:176-194): the
    causal self-attention sub-block is replaced by a causal convolution whose
    kernel weights are softmax-normalized and shared across ``wshare`` channel
    groups; 'dynamic' predicts the kernel per position from the current
    feature. ``two_dim`` convolves over the (time, feature) plane — causal in
    time, same-padded in feature — instead of time only. Cross-attention and
    FFN are unchanged.
    """

    size: int
    attention_heads: int = 4
    linear_units: int = 2048
    kernel_size: int = 11
    dynamic: bool = False
    two_dim: bool = False
    wshare: int = 4
    use_bias: bool = False
    src_attention_dropout_rate: float = 0.0
    dropout_rate: float = 0.1

    def setup(self):
        self.glu_proj = nn.Dense(2 * self.size, name="glu_proj")
        k = self.kernel_size
        n_taps = k * k if self.two_dim else k
        if self.dynamic:
            self.weight_proj = nn.Dense(self.wshare * n_taps, name="weight_proj")
        else:
            self.conv_weight = self.param(
                "conv_weight",
                nn.initializers.lecun_normal(),
                (self.wshare, n_taps),
            )
        if self.use_bias:
            self.conv_bias = self.param(
                "conv_bias", nn.initializers.zeros, (self.size,)
            )
        self.out_proj = nn.Dense(self.size, name="out_proj")
        self.src_attn = MultiHeadedAttention(
            self.attention_heads, self.src_attention_dropout_rate, self.size,
            name="src_attn",
        )
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, "relu", name="feed_forward"
        )
        self.norm1 = nn.LayerNorm()
        self.norm2 = nn.LayerNorm()
        self.norm3 = nn.LayerNorm()
        self.dropout = nn.Dropout(self.dropout_rate)

    def _conv(self, h: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        b, t, d = h.shape
        hh, k = self.wshare, self.kernel_size
        x = self.glu_proj(h)
        x = x[..., :d] * nn.sigmoid(x[..., d:])  # GLU
        # softmax-normalized kernels, shared across `wshare` channel groups
        if self.dynamic:
            n_taps = k * k if self.two_dim else k
            w = self.weight_proj(x).reshape(b, t, hh, n_taps)
            w = jax.nn.softmax(w, axis=-1)
            w = jnp.repeat(w, d // hh, axis=2)  # (B, T, D, taps)
        else:
            w = jax.nn.softmax(self.conv_weight, axis=-1)
            w = jnp.repeat(w, d // hh, axis=0)  # (D, taps)
        # causal left-pad in time, unfold k time taps
        xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
        if self.two_dim:
            # conv over the (time, feature) plane: causal in time, 'same' in
            # feature. Feature tap j of output channel c reads channel
            # c - k//2 + j, accumulated over a static python loop (k is small).
            pf = k // 2
            xpf = jnp.pad(xp, ((0, 0), (0, 0), (pf, pf)))
            tapsf = jnp.stack(
                [xpf[:, i : i + t] for i in range(k)], axis=2
            )  # (B, T, k_t, D + 2*pf)
            wk = (
                w.reshape(b, t, d, k, k)
                if self.dynamic
                else w.reshape(d, k, k)
            )
            y = jnp.zeros((b, t, d), x.dtype)
            for j in range(k):
                tj = tapsf[..., j : j + d]  # (B, T, k_t, D)
                y = y + (
                    jnp.einsum("btkd,btdk->btd", tj, wk[..., j])
                    if self.dynamic
                    else jnp.einsum("btkd,dk->btd", tj, wk[..., j])
                )
        else:
            taps = jnp.stack(
                [xp[:, i : i + t] for i in range(k)], axis=2
            )  # (B, T, k, D)
            y = (
                jnp.einsum("btkd,btdk->btd", taps, w)
                if self.dynamic
                else jnp.einsum("btkd,dk->btd", taps, w)
            )
        if self.use_bias:
            y = y + self.conv_bias
        return self.out_proj(y)

    def __call__(self, tgt, tgt_mask, memory, memory_mask, *, deterministic=True):
        # the conv taps look strictly left (causal pad), so padded positions
        # (always to the right) can never leak into valid outputs — no query
        # masking needed; tgt_mask only matters for attention-based layers
        del tgt_mask
        h = self.norm1(tgt)
        tgt = tgt + self.dropout(
            self._conv(h, deterministic), deterministic=deterministic
        )
        h = self.norm2(tgt)
        tgt = tgt + self.dropout(
            self.src_attn(h, memory, memory, memory_mask, deterministic=deterministic),
            deterministic=deterministic,
        )
        h = self.norm3(tgt)
        tgt = tgt + self.dropout(
            self.feed_forward(h, deterministic=deterministic),
            deterministic=deterministic,
        )
        return tgt


class _DecoderBase(nn.Module):
    vocab_size: int
    encoder_output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    use_output_layer: bool = True
    # 'transformer'|'sim_t'|'lightconv'|'dynamicconv'|'lightconv2d'|'dynamicconv2d'
    layer_variant: str = "transformer"
    conv_kernel_length: object = 11  # int or per-layer tuple (conv variants)
    conv_wshare: int = 4  # channel groups sharing one conv kernel
    conv_usebias: bool = False

    def _kernel(self, i: int) -> int:
        k = self.conv_kernel_length
        return int(k) if isinstance(k, int) else int(k[i])

    def setup(self):
        d = self.encoder_output_size
        self.embed_tok = nn.Embed(self.vocab_size, d, name="embed_tok")
        self.pos_enc = AbsolutePositionalEncoding(self.positional_dropout_rate)
        if self.layer_variant in (
            "lightconv", "dynamicconv", "lightconv2d", "dynamicconv2d"
        ):
            self.layers = [
                ConvDecoderLayer(
                    size=d,
                    attention_heads=self.attention_heads,
                    linear_units=self.linear_units,
                    kernel_size=self._kernel(i),
                    dynamic=self.layer_variant.startswith("dynamicconv"),
                    two_dim=self.layer_variant.endswith("2d"),
                    wshare=self.conv_wshare,
                    use_bias=self.conv_usebias,
                    src_attention_dropout_rate=self.src_attention_dropout_rate,
                    dropout_rate=self.dropout_rate,
                    name=f"layer_{i}",
                )
                for i in range(self.num_blocks)
            ]
        elif self.layer_variant == "sim_t":
            self.layers = [
                SimTDecoderLayer(
                    size=d,
                    attention_heads=self.attention_heads,
                    linear_units=self.linear_units,
                    attention_dropout_rate=self.self_attention_dropout_rate,
                    dropout_rate=self.dropout_rate,
                    name=f"layer_{i}",
                )
                for i in range(self.num_blocks)
            ]
        else:
            self.layers = [
                TransformerDecoderLayer(
                    size=d,
                    attention_heads=self.attention_heads,
                    linear_units=self.linear_units,
                    self_attention_dropout_rate=self.self_attention_dropout_rate,
                    src_attention_dropout_rate=self.src_attention_dropout_rate,
                    dropout_rate=self.dropout_rate,
                    name=f"layer_{i}",
                )
                for i in range(self.num_blocks)
            ]
        self.after_norm = nn.LayerNorm(name="after_norm")
        if self.use_output_layer:
            self.output_layer = nn.Dense(self.vocab_size, name="output_layer")

    def _run(self, tgt, tgt_mask, memory, memory_mask, deterministic):
        x = self.pos_enc(self.embed_tok(tgt), deterministic=deterministic)
        s1 = None
        for layer in self.layers:
            if self.layer_variant == "sim_t":
                x, s1 = layer(
                    x, tgt_mask, memory, memory_mask, s1, deterministic=deterministic
                )
            else:
                x = layer(x, tgt_mask, memory, memory_mask, deterministic=deterministic)
        x = self.after_norm(x)
        if self.use_output_layer:
            x = self.output_layer(x)
        return x


class TransformerDecoder(_DecoderBase):
    """Autoregressive decoder: causal self-attention."""

    def __call__(
        self,
        memory: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
        ys_in: jnp.ndarray,
        ys_in_lengths: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, t = ys_in.shape
        tgt_mask = causal_mask(b, t, ys_in_lengths)
        return self._run(ys_in, tgt_mask, memory, memory_mask, deterministic)

    def score_step(
        self,
        memory: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
        ys: jnp.ndarray,
        pos: jnp.ndarray,
    ) -> jnp.ndarray:
        """Log-probs of the token AT position ``pos`` given prefix ys[:, :pos].

        ys is a fixed-size (B, Lmax) buffer; pos is a scalar int32. Used by the
        jitted beam search (full-prefix recompute, static shapes).
        """
        b, t = ys.shape
        tgt_mask = causal_mask(b, t) & (
            jnp.arange(t)[None, None, :] < pos
        )  # only the first `pos` tokens are visible
        logits = self._run(ys, tgt_mask, memory, memory_mask, True)
        step_logits = jnp.take_along_axis(
            logits, (pos - 1)[None, None, None].repeat(b, 0), axis=1
        ).squeeze(1)
        return jax.nn.log_softmax(step_logits, axis=-1)


    # ---- KV-cache fast path (jitted beam search) ---------------------------
    # Turns the O(L) full-prefix recompute per step into O(1): self-attn K/V
    # are cached per layer and cross-attn K/V precomputed once per utterance.
    # Transformer layers only (Sim-T re-applies layer-1 scores across the full
    # prefix, so it keeps the recompute path).

    def precompute_memory(self, memory: jnp.ndarray):
        """Per-layer cross-attention (K, V) from encoder memory."""
        assert self.layer_variant == "transformer"
        return [layer.src_attn.project_kv(memory) for layer in self.layers]

    def init_cache(self, n: int, max_len: int, dtype=jnp.float32):
        """Per-layer (K, V) tensors, each (N, H, Lc, dk), N leading — kept
        separate and contiguous; a stacked buffer made the per-layer
        update/attend strided and measured 35% slower. The beam reorder is
        gather-free either way (decode.beam_search.reorder_beam_rows)."""
        d = self.encoder_output_size
        h, dk = self.attention_heads, d // self.attention_heads
        return [
            (
                jnp.zeros((n, h, max_len, dk), dtype),
                jnp.zeros((n, h, max_len, dk), dtype),
            )
            for _ in range(self.num_blocks)  # callable outside apply
        ]

    def init_cache_group(self, b: int, beam: int, max_len: int,
                         dtype=jnp.float32, quantized: bool = False):
        """Group-major (B, H, beam, Lc, dk) per-layer (K, V) tensors for the
        ancestry-cache beam protocol (``score_step_anc``): the beam*Lc
        columns of a group sit contiguously per (batch, head), so the group
        attend is one dot_general per step and the column write is one
        in-place Pallas block write (``decode.beam_search.write_beam_column``
        / ``ops.cache_update``). Lc is rounded up to a multiple of 8 so the
        write kernel's aligned block DMA is always in bounds; the attend
        masks columns >= pos, so the pad columns are never read as live."""
        d = self.encoder_output_size
        h, dk = self.attention_heads, d // self.attention_heads
        if quantized:
            # int8 payload + per-column scales (ops/kv_quant.py); Lc rounds
            # to 32 for the int8 sublane tile (ops/cache_update._blk)
            lc = -(-max_len // 32) * 32
            side = lambda: (
                jnp.zeros((b, h, beam, lc, dk), jnp.int8),
                jnp.zeros((b, h, beam, lc), jnp.float32),
            )
            return [(side(), side()) for _ in range(self.num_blocks)]
        lc = -(-max_len // 8) * 8
        return [
            (
                jnp.zeros((b, h, beam, lc, dk), dtype),
                jnp.zeros((b, h, beam, lc, dk), dtype),
            )
            for _ in range(self.num_blocks)
        ]

    # Length-segmented cache: the beam loop's per-step cost on a plain cache
    # is proportional to max_len (gather on reorder + attention read), but
    # only rows [0:pos] are live. Splitting the length axis into segments and
    # guarding each with lax.cond on the scalar step index makes both the
    # gather and the attention skip segments entirely beyond pos — exact,
    # and the average traffic halves (docs/ROADMAP.md item 3).

    def init_cache_seg(self, n: int, max_len: int, dtype=jnp.float32,
                       num_segments: int = 4):
        d = self.encoder_output_size
        h, dk = self.attention_heads, d // self.attention_heads
        seg = -(-max_len // num_segments)
        return [
            tuple(
                tuple(
                    jnp.zeros((n, h, seg, dk), dtype)
                    for _ in range(num_segments)
                )
                for _ in range(2)  # (K segments, V segments)
            )
            for _ in range(self.num_blocks)
        ]

    @staticmethod
    def gather_cache_seg(cache, g_src, pos):
        """Beam-reorder gather that skips segments beyond ``pos`` (scalar)."""
        out = []
        for (ks, vs) in cache:
            seg = ks[0].shape[2]
            def sel(x, lo):
                return jax.lax.cond(
                    pos > lo, lambda a: a[g_src], lambda a: a, x
                )
            out.append((
                tuple(sel(x, i * seg) for i, x in enumerate(ks)),
                tuple(sel(x, i * seg) for i, x in enumerate(vs)),
            ))
        return out

    def score_step_cached_seg(
        self,
        mem_kv,
        memory_mask: Optional[jnp.ndarray],
        ys: jnp.ndarray,  # (N, L)
        pos: jnp.ndarray,  # scalar
        cache,  # list over layers of (K segments, V segments)
    ):
        """Segmented-cache twin of ``score_step_cached`` (same numerics)."""
        assert self.layer_variant == "transformer"
        n, l = ys.shape
        tok = jnp.take_along_axis(
            ys, jnp.clip(pos - 1, 0, l - 1)[None, None].repeat(n, 0), axis=1
        )
        x = self.embed_tok(tok)
        seg = cache[0][0][0].shape[2]
        lc = seg * len(cache[0][0])
        x = self.pos_enc.at_position(x, pos - 1, lc)
        idx = pos - 1
        new_cache = []
        for layer, (mk, mv), (ks, vs) in zip(self.layers, mem_kv, cache):
            h = layer.norm1(x)
            k_new, v_new = layer.self_attn.project_kv(h)  # (N, H, 1, dk)

            def upd(args, off):
                kseg, vseg = args
                return (
                    jax.lax.dynamic_update_slice_in_dim(
                        kseg, k_new.astype(kseg.dtype), off, axis=2
                    ),
                    jax.lax.dynamic_update_slice_in_dim(
                        vseg, v_new.astype(vseg.dtype), off, axis=2
                    ),
                )

            ks2, vs2 = [], []
            for si, (kseg, vseg) in enumerate(zip(ks, vs)):
                lo = si * seg
                kseg, vseg = jax.lax.cond(
                    (idx >= lo) & (idx < lo + seg),
                    lambda a, lo=lo: upd(a, idx - lo),
                    lambda a: a,
                    (kseg, vseg),
                )
                ks2.append(kseg)
                vs2.append(vseg)
            x = x + layer.self_attn.attend_kv_segmented(
                h, ks2, vs2, pos, seg
            )
            h = layer.norm2(x)
            x = x + layer.src_attn.attend_kv(h, mk, mv, memory_mask)
            h = layer.norm3(x)
            x = x + layer.feed_forward(h, deterministic=True)
            new_cache.append((tuple(ks2), tuple(vs2)))
        x = self.after_norm(x)
        logits = self.output_layer(x) if self.use_output_layer else x
        return jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1), new_cache

    def score_step_cached(
        self,
        mem_kv,  # list of per-layer (K, V) from precompute_memory
        memory_mask: Optional[jnp.ndarray],
        ys: jnp.ndarray,  # (N, L) fixed-size token buffer
        pos: jnp.ndarray,  # scalar: position being generated
        cache,  # list of per-layer (K, V) self-attention caches
    ):
        """Returns ((N, V) log-probs of token at ``pos``, updated cache)."""
        assert self.layer_variant == "transformer"
        n, l = ys.shape
        lc = cache[0][0].shape[2]
        tok = jnp.take_along_axis(
            ys, jnp.clip(pos - 1, 0, l - 1)[None, None].repeat(n, 0), axis=1
        )  # (N, 1)
        x = self.embed_tok(tok)  # (N, 1, D)
        x = self.pos_enc.at_position(x, pos - 1, lc)
        self_mask = (jnp.arange(lc)[None, :] < pos).repeat(n, 0)  # (N, Lc)
        new_cache = []
        for layer, (mk, mv), (ck, cv) in zip(self.layers, mem_kv, cache):
            h = layer.norm1(x)
            k_new, v_new = layer.self_attn.project_kv(h)  # (N, H, 1, dk)
            ck = jax.lax.dynamic_update_slice_in_dim(
                ck, k_new.astype(ck.dtype), pos - 1, axis=2
            )
            cv = jax.lax.dynamic_update_slice_in_dim(
                cv, v_new.astype(cv.dtype), pos - 1, axis=2
            )
            x = x + layer.self_attn.attend_kv(h, ck, cv, self_mask)
            h = layer.norm2(x)
            x = x + layer.src_attn.attend_kv(h, mk, mv, memory_mask)
            h = layer.norm3(x)
            x = x + layer.feed_forward(h, deterministic=True)
            new_cache.append((ck, cv))
        x = self.after_norm(x)
        logits = self.output_layer(x) if self.use_output_layer else x
        return jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1), new_cache

    def score_step_append(
        self,
        mem_kv,  # list of per-layer (K, V) from precompute_memory
        memory_mask: Optional[jnp.ndarray],
        ys: jnp.ndarray,  # (N, L) fixed-size token buffer
        pos: jnp.ndarray,  # scalar: position being generated
        cache,  # list of per-layer (K, V) self-attention caches
    ):
        """Cache-READ-ONLY beam-step scorer: ((N, V) log-probs, new_kv).

        Twin of ``score_step_cached`` that RETURNS the step's self-attention
        K/V column (per-layer ((N,H,1,dk), (N,H,1,dk))) instead of writing it
        (``attend_kv_append``); the beam loop folds the write into its
        reorder gather (``decode.beam_search.insert_permute_rows``), removing
        the per-layer full-cache materialization a dynamic-update-slice costs
        inside the decode while-loop (see TransformerLM.score_step_append).
        """
        assert self.layer_variant == "transformer"
        n, l = ys.shape
        lc = cache[0][0].shape[2]
        tok = jnp.take_along_axis(
            ys, jnp.clip(pos - 1, 0, l - 1)[None, None].repeat(n, 0), axis=1
        )  # (N, 1)
        x = self.embed_tok(tok)  # (N, 1, D)
        x = self.pos_enc.at_position(x, pos - 1, lc)
        cache_mask = (jnp.arange(lc)[None, :] < pos - 1).repeat(n, 0)  # (N, Lc)
        new_kv = []
        for layer, (mk, mv), (ck, cv) in zip(self.layers, mem_kv, cache):
            h = layer.norm1(x)
            q, k_new, v_new = layer.self_attn.project_qkv(h)  # (N, H, 1, dk)
            x = x + layer.self_attn.attend_kv_append(
                h, ck, cv, k_new, v_new, cache_mask, q_heads=q
            )
            h = layer.norm2(x)
            x = x + layer.src_attn.attend_kv(h, mk, mv, memory_mask)
            h = layer.norm3(x)
            x = x + layer.feed_forward(h, deterministic=True)
            new_kv.append((k_new, v_new))
        x = self.after_norm(x)
        logits = self.output_layer(x) if self.use_output_layer else x
        return jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1), new_kv


    def score_step_anc(
        self,
        mem_kv,  # list of per-layer (K, V) from precompute_memory, B rows
        memory_mask: Optional[jnp.ndarray],  # (B, T) — NOT beam-repeated
        ys: jnp.ndarray,  # (N, L) fixed-size token buffer, N = B*beam
        pos: jnp.ndarray,  # scalar: position being generated
        cache,  # list of per-layer (K, V) self-attention caches (unordered)
        anc: jnp.ndarray,  # (N, >=Lc) int32 ancestry table
        beam: int,
        width: int | None = None,  # static: attend cache columns [0, width)
        fused: bool | None = None,  # per-call kernel choice (attend_kv_anc)
        mesh=None,  # shard the fused kernel over the mesh's 'data' axis
    ):
        """Ancestry-cache beam-step scorer: ((N, V) log-probs, new_kv).

        Twin of ``score_step_append`` for the never-reordered beam KV cache:
        self-attention resolves history through ``anc``
        (``MultiHeadedAttention.attend_kv_anc``), so the beam loop's only
        per-step cache traffic is the attend read plus one column write; and
        cross-attention takes the encoder memory K/V with B rows — shared
        across each beam group (``attend_kv_mem_grouped``) instead of
        beam-repeated, cutting its per-step HBM read by the beam factor.
        """
        assert self.layer_variant == "transformer"
        n, l = ys.shape
        ck0 = cache[0][0]
        # int8 cache sides are (payload, per-column scale) tuples
        lc = (ck0[0] if isinstance(ck0, tuple) else ck0).shape[3]
        tok = jnp.take_along_axis(
            ys, jnp.clip(pos - 1, 0, l - 1)[None, None].repeat(n, 0), axis=1
        )  # (N, 1)
        x = self.embed_tok(tok)  # (N, 1, D)
        x = self.pos_enc.at_position(x, pos - 1, lc)
        new_kv = []
        for layer, (mk, mv), (ck, cv) in zip(self.layers, mem_kv, cache):
            h = layer.norm1(x)
            q, k_new, v_new = layer.self_attn.project_qkv(h)  # (N, H, 1, dk)
            x = x + layer.self_attn.attend_kv_anc(
                ck, cv, k_new, v_new, anc, pos, beam, q, width=width,
                fused=fused, mesh=mesh,
            )
            h = layer.norm2(x)
            x = x + layer.src_attn.attend_kv_mem_grouped(
                h, mk, mv, memory_mask, beam
            )
            h = layer.norm3(x)
            x = x + layer.feed_forward(h, deterministic=True)
            new_kv.append((k_new, v_new))
        x = self.after_norm(x)
        logits = self.output_layer(x) if self.use_output_layer else x
        return jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1), new_kv


class MLMDecoder(_DecoderBase):
    """Mask-CTC MLM decoder: full (non-causal) self-attention over tokens."""

    def __call__(
        self,
        memory: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
        ys_in: jnp.ndarray,
        ys_in_lengths: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, t = ys_in.shape
        tgt_mask = (
            jnp.arange(t)[None, :] < ys_in_lengths[:, None]
        )  # (B, T) token-validity, full attention among valid tokens
        return self._run(ys_in, tgt_mask, memory, memory_mask, deterministic)


class SimTDecoder(TransformerDecoder):
    """AR decoder built from Sim-T layers."""

    layer_variant: str = "sim_t"


class SimTMLMDecoder(MLMDecoder):
    """Mask-CTC MLM decoder built from Sim-T layers
    (/root/reference/src/decoder/sim_t/mlm_decoder.py)."""

    layer_variant: str = "sim_t"


class LightConvDecoder(TransformerDecoder):
    """AR decoder with causal lightweight-convolution self-blocks."""

    layer_variant: str = "lightconv"


class DynamicConvDecoder(TransformerDecoder):
    """AR decoder with causal dynamic-convolution self-blocks."""

    layer_variant: str = "dynamicconv"


class LightConv2DDecoder(TransformerDecoder):
    """AR decoder with causal 2D (time x feature) lightweight-conv self-blocks
    (espnet ``LightweightConvolution2DTransformerDecoder`` choice,
    /root/reference/src/tasks/asr.py:181)."""

    layer_variant: str = "lightconv2d"


class DynamicConv2DDecoder(TransformerDecoder):
    """AR decoder with causal 2D (time x feature) dynamic-conv self-blocks
    (espnet ``DynamicConvolution2DTransformerDecoder`` choice,
    /root/reference/src/tasks/asr.py:183)."""

    layer_variant: str = "dynamicconv2d"
