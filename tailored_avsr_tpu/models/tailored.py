"""Tailored unified audio-visual encoder.

Capability parity with /root/reference/src/encoder/audiovisual/tailored/
encoder.py:36-332 and encoder_layer.py:60-274:

- learned modality embedding (Embed(2, d)) added to each stream;
- N layers, each processing BOTH streams through a per-modality single branch
  (MHA if ``*_use_attn[l]`` else cgMLP), with the macaron-FFN and FFN weights
  SHARED across modalities (the parameter saving that makes the tailored model
  59.3M vs 103.5M params);
- per-layer flow per modality: macaron-FFN -> (MHA | cgMLP) -> FFN -> LayerNorm;
- interCTC taps fuse the two normalized intermediate streams through the
  audiovisual fusion module, with optional (audio-visual) CTC conditioning.

TPU-first: both streams run through the same traced layer stack; the shared
FFNs are applied to the concatenated [audio; video] batch so the MXU sees one
double-size GEMM instead of two half-size ones.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.attention import (
    FastSelfAttention,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)
from tailored_avsr_tpu.ops.cgmlp import ConvolutionalGatingMLP
from tailored_avsr_tpu.ops.feedforward import PositionwiseFeedForward


def _coin(module: nn.Module, rate: float, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate <= 0.0:
        return jnp.asarray(False)
    return jax.random.uniform(module.make_rng("skip")) < rate


class TailoredEncoderLayer(nn.Module):
    size: int
    acoustic_use_attn: bool
    visual_use_attn: bool
    attention_heads: int = 4
    attention_layer_type: str = "rel_selfattn"
    attention_dropout_rate: float = 0.0
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"
    linear_units: int = 2048
    ffn_activation: str = "swish"
    macaron: bool = True
    dropout_rate: float = 0.1
    acoustic_branch_drop_rate: float = 0.0  # stored for config parity; the
    # reference layer stores but never uses it (encoder_layer.py:116) — the
    # acoustic drop that IS active lives in the fusion module.
    stochastic_depth_rate: float = 0.0
    zero_triu: bool = False
    use_flash: bool = False
    use_fused_csgu: bool = False  # Pallas fused gate: 3.6x faster per layer but
    # ~70s Mosaic compile per call site under remote compilation; enable for
    # long-running serving, not one-shot benchmarks.

    def _make_branch(self, use_attn: bool, prefix: str):
        if use_attn:
            if self.attention_layer_type in ("rel_selfattn", "legacy_rel_selfattn"):
                return RelPositionMultiHeadedAttention(
                    self.attention_heads,
                    self.attention_dropout_rate,
                    self.zero_triu,
                    self.use_flash,
                    legacy=self.attention_layer_type == "legacy_rel_selfattn",
                    name=f"{prefix}_attn",
                )
            if self.attention_layer_type == "selfattn":
                return MultiHeadedAttention(
                    self.attention_heads, self.attention_dropout_rate, self.size,
                    name=f"{prefix}_attn",
                )
            if self.attention_layer_type == "fast_selfattn":
                return FastSelfAttention(
                    self.attention_heads, self.attention_dropout_rate,
                    name=f"{prefix}_attn",
                )
            raise ValueError(self.attention_layer_type)
        return ConvolutionalGatingMLP(
            self.cgmlp_linear_units,
            self.cgmlp_conv_kernel,
            self.dropout_rate,
            self.use_linear_after_conv,
            self.gate_activation,
            use_fused=self.use_fused_csgu,
            name=f"{prefix}_cgmlp",
        )

    def setup(self):
        # shared across modalities
        if self.macaron:
            self.feed_forward_macaron = PositionwiseFeedForward(
                self.linear_units, self.dropout_rate, self.ffn_activation,
                name="feed_forward_macaron",
            )
            self.norm_ff_macaron = nn.LayerNorm()
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, self.ffn_activation,
            name="feed_forward",
        )
        self.norm_ff = nn.LayerNorm()
        self.norm_final = nn.LayerNorm()
        self.dropout = nn.Dropout(self.dropout_rate)
        # per-modality single branch
        self.acoustic_branch = self._make_branch(self.acoustic_use_attn, "acoustic")
        self.acoustic_norm = nn.LayerNorm()
        self.visual_branch = self._make_branch(self.visual_use_attn, "visual")
        self.visual_norm = nn.LayerNorm()

    def _branch(self, x, pos_emb, mask, use_attn, branch, branch_norm, coeff,
                deterministic):
        residual = x
        h = branch_norm(x)
        if use_attn:
            if self.attention_layer_type == "fast_selfattn":
                h = branch(h, mask, deterministic=deterministic)
            elif pos_emb is not None and self.attention_layer_type.endswith("rel_selfattn"):
                h = branch(h, h, h, pos_emb, mask, deterministic=deterministic)
            else:
                h = branch(h, h, h, mask, deterministic=deterministic)
        else:
            h = branch(h, mask, deterministic=deterministic)
        return residual + coeff * self.dropout(h, deterministic=deterministic)

    def _shared_ffn(self, ffn, norm, a, v, deterministic):
        """Apply a modality-SHARED FFN to the stacked [audio; video] batch:
        one 2B-row GEMM pair instead of two B-row ones (half the op count;
        the weights are shared by construction, encoder_layer.py:84-108)."""
        b = a.shape[0]
        x = jnp.concatenate([a, v], axis=0)
        x = x + 0.5 * self.dropout(
            ffn(norm(x), deterministic=deterministic), deterministic=deterministic
        )
        return x[:b], x[b:]

    def __call__(
        self,
        audio: jnp.ndarray,
        audio_pos_emb: Optional[jnp.ndarray],
        audio_mask: Optional[jnp.ndarray],
        video: jnp.ndarray,
        video_pos_emb: Optional[jnp.ndarray],
        video_mask: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
    ):
        skip = _coin(self, self.stochastic_depth_rate, deterministic)
        coeff = 1.0 if deterministic or self.stochastic_depth_rate == 0 else 1.0 / (
            1.0 - self.stochastic_depth_rate
        )
        # streams are length-aligned by the AVSR model (avsr_model.py), so the
        # shared-weight FFN sub-blocks run on the stacked 2B batch; only the
        # per-modality branches (separate weights) run per stream
        stack = audio.shape == video.shape
        a, v = audio, video
        if self.macaron:
            if stack:
                a, v = self._shared_ffn(
                    self.feed_forward_macaron, self.norm_ff_macaron, a, v,
                    deterministic,
                )
            else:
                a = a + 0.5 * self.dropout(
                    self.feed_forward_macaron(
                        self.norm_ff_macaron(a), deterministic=deterministic
                    ), deterministic=deterministic)
                v = v + 0.5 * self.dropout(
                    self.feed_forward_macaron(
                        self.norm_ff_macaron(v), deterministic=deterministic
                    ), deterministic=deterministic)
        a = self._branch(
            a, audio_pos_emb, audio_mask,
            self.acoustic_use_attn, self.acoustic_branch, self.acoustic_norm,
            coeff, deterministic,
        )
        v = self._branch(
            v, video_pos_emb, video_mask,
            self.visual_use_attn, self.visual_branch, self.visual_norm,
            coeff, deterministic,
        )
        if stack:
            a, v = self._shared_ffn(
                self.feed_forward, self.norm_ff, a, v, deterministic
            )
            b = a.shape[0]
            av = self.norm_final(jnp.concatenate([a, v], axis=0))
            a, v = av[:b], av[b:]
        else:
            a = self.norm_final(
                a + 0.5 * self.dropout(
                    self.feed_forward(self.norm_ff(a), deterministic=deterministic),
                    deterministic=deterministic)
            )
            v = self.norm_final(
                v + 0.5 * self.dropout(
                    self.feed_forward(self.norm_ff(v), deterministic=deterministic),
                    deterministic=deterministic)
            )
        a = jnp.where(skip, audio, a)
        v = jnp.where(skip, video, v)
        return a, v


class TailoredEncoder(nn.Module):
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    acoustic_branch_drop_rate: Union[float, Sequence[float]] = 0.0
    attention_layer_type: str = "rel_selfattn"
    ffn_activation_type: str = "swish"
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    gate_activation: str = "identity"
    use_linear_after_conv: bool = False
    acoustic_use_attn: Sequence[bool] = (True,) * 12
    visual_use_attn: Sequence[bool] = (False,) * 12
    macaron: bool = True
    zero_triu: bool = False
    normalize_before: bool = True
    interctc_use_conditioning: bool = False
    audiovisual_interctc_conditioning: bool = False
    interctc_layer_idx: Sequence[int] = ()
    stochastic_depth_rate: Union[float, Sequence[float]] = 0.0
    use_flash: bool = False
    use_fused_csgu: bool = False

    def _per_layer(self, v):
        if isinstance(v, (int, float)):
            return [float(v)] * self.num_blocks
        assert len(v) == self.num_blocks
        return list(v)

    def setup(self):
        assert len(self.acoustic_use_attn) == self.num_blocks
        assert len(self.visual_use_attn) == self.num_blocks
        assert not (
            self.audiovisual_interctc_conditioning and not self.interctc_use_conditioning
        ), "AV interCTC conditioning requires interctc_use_conditioning"
        self.modality_encoding = nn.Embed(2, self.output_size, name="modality_encoding")
        sdr = self._per_layer(self.stochastic_depth_rate)
        abd = self._per_layer(self.acoustic_branch_drop_rate)
        self.layers = [
            TailoredEncoderLayer(
                size=self.output_size,
                acoustic_use_attn=bool(self.acoustic_use_attn[i]),
                visual_use_attn=bool(self.visual_use_attn[i]),
                attention_heads=self.attention_heads,
                attention_layer_type=self.attention_layer_type,
                attention_dropout_rate=self.attention_dropout_rate,
                cgmlp_linear_units=self.cgmlp_linear_units,
                cgmlp_conv_kernel=self.cgmlp_conv_kernel,
                use_linear_after_conv=self.use_linear_after_conv,
                gate_activation=self.gate_activation,
                linear_units=self.linear_units,
                ffn_activation=self.ffn_activation_type,
                macaron=self.macaron,
                dropout_rate=self.dropout_rate,
                acoustic_branch_drop_rate=abd[i],
                stochastic_depth_rate=sdr[i],
                zero_triu=self.zero_triu,
                use_flash=self.use_flash,
                use_fused_csgu=self.use_fused_csgu,
                name=f"layer_{i}",
            )
            for i in range(self.num_blocks)
        ]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(name="after_norm")
        if self.interctc_use_conditioning:
            self.conditioning_layer_mod = nn.Dense(
                self.output_size, name="conditioning_layer"
            )

    def __call__(
        self,
        audio: jnp.ndarray,
        audio_pos_emb: Optional[jnp.ndarray],
        audio_mask: Optional[jnp.ndarray],
        video: jnp.ndarray,
        video_pos_emb: Optional[jnp.ndarray],
        video_mask: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
        ctc=None,
        audiovisual_fusion=None,
    ):
        """Returns (audio, audio_mask, video, video_mask, aux) with aux holding
        'intermediate_outs' [(layer_idx, fused_av_out)]."""
        mod = self.modality_encoding(jnp.arange(2))
        audio = audio + mod[0].astype(audio.dtype)
        video = video + mod[1].astype(video.dtype)

        intermediate_outs = []
        for i, layer in enumerate(self.layers):
            audio, video = layer(
                audio, audio_pos_emb, audio_mask,
                video, video_pos_emb, video_mask,
                deterministic=deterministic,
            )
            if (i + 1) in tuple(self.interctc_layer_idx):
                a_out, v_out = audio, video
                if self.normalize_before:
                    a_out = self.after_norm(a_out)
                    v_out = self.after_norm(v_out)
                av_out, _, _ = audiovisual_fusion(
                    a_out, audio_mask, v_out, video_mask, deterministic=deterministic
                )
                intermediate_outs.append((i + 1, av_out))
                if self.interctc_use_conditioning and ctc is not None:
                    if self.audiovisual_interctc_conditioning:
                        c = ctc.softmax(av_out)
                        ca, cv = c, c
                    else:
                        ca, cv = ctc.softmax(a_out), ctc.softmax(v_out)
                    audio = audio + self.conditioning_layer_mod(ca)
                    video = video + self.conditioning_layer_mod(cv)

        if self.normalize_before:
            audio = self.after_norm(audio)
            video = self.after_norm(video)
        return audio, audio_mask, video, video_mask, {
            "intermediate_outs": intermediate_outs
        }
