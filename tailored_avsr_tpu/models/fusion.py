"""Adaptive audio-visual fusion with learned per-utterance modality weights.

Capability parity with /root/reference/src/audiovisual_fusion/
adaptive_audiovisual_fusion.py:29-211: merge methods concat / learned_ave
(attention-pooled per-modality scalar weights, softmax over the two
modalities) / fixed_ave; merged stream through an "upsampling" positionwise
FFN (d -> hidden -> d) + final LayerNorm; output mask = audio OR video mask;
optional train-time acoustic-branch drop.

The learned modality weights are returned in an aux dict (the reference stashes
them on attributes for src/scripts/study_adaptive_fusion.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.feedforward import PositionwiseFeedForward
from tailored_avsr_tpu.ops.masking import MASK_MIN


class AdaptiveAudioVisualFusion(nn.Module):
    output_size: int = 256
    hidden_units: int = 2048
    audiovisual_layer_type: str = "upsampling_positionwise"
    merge_method: str = "learned_ave"
    activation_type: str = "swish"
    acoustic_weight: float = 0.5
    dropout_rate: float = 0.1
    acoustic_branch_drop_rate: float = 0.0

    def setup(self):
        if self.audiovisual_layer_type != "upsampling_positionwise":
            raise ValueError("only upsampling_positionwise fusion is supported")
        self.audiovisual_layer = PositionwiseFeedForward(
            self.hidden_units,
            self.dropout_rate,
            self.activation_type,
            output_size=self.output_size,
            name="audiovisual_layer",
        )
        if self.merge_method == "learned_ave":
            self.acoustic_pooling_proj = nn.Dense(1, name="acoustic_pooling_proj")
            self.visual_pooling_proj = nn.Dense(1, name="visual_pooling_proj")
            self.acoustic_weight_proj = nn.Dense(1, name="acoustic_weight_proj")
            self.visual_weight_proj = nn.Dense(1, name="visual_weight_proj")
        elif self.merge_method not in ("concat", "fixed_ave"):
            raise ValueError(self.merge_method)
        self.norm_final = nn.LayerNorm(name="norm_final")

    def _pool_weight(self, x, mask, pooling_proj, weight_proj):
        from tailored_avsr_tpu.models.branchformer import (
            attention_pooled_weight,
        )

        return attention_pooled_weight(
            x, mask, pooling_proj, weight_proj, x.shape[-1]
        )

    def __call__(
        self,
        audio: jnp.ndarray,
        audio_mask: Optional[jnp.ndarray],
        video: jnp.ndarray,
        video_mask: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
    ):
        """Returns (audiovisual (B, T, D), av_mask (B, T), aux weights dict)."""
        aux = {}
        if self.merge_method == "concat":
            av = self.audiovisual_layer(
                jnp.concatenate([audio, video], axis=-1), deterministic=deterministic
            )
        elif self.merge_method == "learned_ave":
            wa = self._pool_weight(
                audio, audio_mask, self.acoustic_pooling_proj, self.acoustic_weight_proj
            )
            wv = self._pool_weight(
                video, video_mask, self.visual_pooling_proj, self.visual_weight_proj
            )
            w = jax.nn.softmax(
                jnp.concatenate([wa, wv], axis=-1).astype(jnp.float32), axis=-1
            ).astype(audio.dtype)  # (B, 2)
            if not deterministic and self.acoustic_branch_drop_rate > 0:
                drop = jax.random.uniform(self.make_rng("skip")) < self.acoustic_branch_drop_rate
                w = jnp.where(drop, jnp.asarray([0.0, 1.0], dtype=w.dtype)[None], w)
            aux["acoustic_weight"] = w[:, 0]
            aux["visual_weight"] = w[:, 1]
            av = self.audiovisual_layer(
                w[:, 0, None, None] * audio + w[:, 1, None, None] * video,
                deterministic=deterministic,
            )
        else:  # fixed_ave
            av = self.audiovisual_layer(
                self.acoustic_weight * audio + (1.0 - self.acoustic_weight) * video,
                deterministic=deterministic,
            )
        av = self.norm_final(av)
        if audio_mask is None and video_mask is None:
            av_mask = None
        else:
            # a None mask means 'all frames valid' — substituting False
            # would invert it and undercount enc_lens downstream
            am = audio_mask if audio_mask is not None else jnp.ones(av.shape[:2], bool)
            vm = video_mask if video_mask is not None else jnp.ones(av.shape[:2], bool)
            av_mask = jnp.logical_or(am, vm)
        return av, av_mask, aux
