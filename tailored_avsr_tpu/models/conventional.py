"""Conventional audio-visual encoder: two independent per-modality stacks.

Capability parity with /root/reference/src/encoder/audiovisual/conventional/
encoder.py:36-225: wraps two sub-encoders of equal depth/width (Branchformer
layers here; the reference also allows espnet Conformer) with the input embeds
stripped (the AVSR embedding layer owns projection + pos-enc), runs the streams
independently — zipped per layer when interCTC taps need fused intermediates —
and normalizes each stream at the end. InterCTC fuses the normalized
intermediates through the audiovisual fusion module, with optional (AV) CTC
self-conditioning, exactly like the tailored encoder.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from tailored_avsr_tpu.models.branchformer import BranchformerEncoderLayer


class ConventionalEncoder(nn.Module):
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    attention_layer_type: str = "rel_selfattn"
    ffn_activation_type: str = "swish"
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"
    merge_method: str = "learned_ave"
    cgmlp_weight: Union[float, Sequence[float]] = 0.5
    attn_branch_drop_rate: Union[float, Sequence[float]] = 0.0
    stochastic_depth_rate: Union[float, Sequence[float]] = 0.0
    macaron: bool = True
    normalize_before: bool = True
    interctc_layer_idx: Sequence[int] = ()
    interctc_use_conditioning: bool = False
    audiovisual_interctc_conditioning: bool = False
    use_flash: bool = False
    encoder_class_type: str = "branchformer"  # 'branchformer' | 'conformer'
    cnn_module_kernel: int = 31

    def _per_layer(self, v):
        if isinstance(v, (int, float)):
            return [float(v)] * self.num_blocks
        assert len(v) == self.num_blocks
        return list(v)

    def setup(self):
        assert not (
            self.audiovisual_interctc_conditioning and not self.interctc_use_conditioning
        )
        cgw = self._per_layer(self.cgmlp_weight)
        abd = self._per_layer(self.attn_branch_drop_rate)
        sdr = self._per_layer(self.stochastic_depth_rate)

        def make_stack(prefix):
            if self.encoder_class_type == "conformer":
                from tailored_avsr_tpu.models.conformer import ConformerEncoderLayer

                return [
                    ConformerEncoderLayer(
                        size=self.output_size,
                        attention_heads=self.attention_heads,
                        attention_layer_type=self.attention_layer_type,
                        attention_dropout_rate=self.attention_dropout_rate,
                        cnn_module_kernel=self.cnn_module_kernel,
                        linear_units=self.linear_units,
                        ffn_activation=self.ffn_activation_type,
                        macaron=self.macaron,
                        dropout_rate=self.dropout_rate,
                        stochastic_depth_rate=sdr[i],
                        use_flash=self.use_flash,
                        name=f"{prefix}_layer_{i}",
                    )
                    for i in range(self.num_blocks)
                ]
            return [
                BranchformerEncoderLayer(
                    size=self.output_size,
                    attention_heads=self.attention_heads,
                    attention_layer_type=self.attention_layer_type,
                    attention_dropout_rate=self.attention_dropout_rate,
                    use_attn=True,
                    use_cgmlp=True,
                    cgmlp_linear_units=self.cgmlp_linear_units,
                    cgmlp_conv_kernel=self.cgmlp_conv_kernel,
                    use_linear_after_conv=self.use_linear_after_conv,
                    gate_activation=self.gate_activation,
                    linear_units=self.linear_units,
                    ffn_activation=self.ffn_activation_type,
                    macaron=self.macaron,
                    dropout_rate=self.dropout_rate,
                    merge_method=self.merge_method,
                    cgmlp_weight=cgw[i],
                    attn_branch_drop_rate=abd[i],
                    stochastic_depth_rate=sdr[i],
                    use_flash=self.use_flash,
                    name=f"{prefix}_layer_{i}",
                )
                for i in range(self.num_blocks)
            ]

        self.acoustic_layers = make_stack("acoustic")
        self.visual_layers = make_stack("visual")
        if self.normalize_before:
            self.acoustic_after_norm = nn.LayerNorm(name="acoustic_after_norm")
            self.visual_after_norm = nn.LayerNorm(name="visual_after_norm")
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
        intermediate_outs = []
        branch_weights = []
        for i in range(self.num_blocks):
            audio, a_aux = self.acoustic_layers[i](
                audio, audio_pos_emb, audio_mask, deterministic=deterministic
            )
            video, v_aux = self.visual_layers[i](
                video, video_pos_emb, video_mask, deterministic=deterministic
            )
            if a_aux or v_aux:
                branch_weights.append((i + 1, {"acoustic": a_aux, "visual": v_aux}))
            if (i + 1) in tuple(self.interctc_layer_idx):
                a_out = self.acoustic_after_norm(audio) if self.normalize_before else audio
                v_out = self.visual_after_norm(video) if self.normalize_before else video
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
            audio = self.acoustic_after_norm(audio)
            video = self.visual_after_norm(video)
        return audio, audio_mask, video, video_mask, {
            "intermediate_outs": intermediate_outs,
            "branch_weights": branch_weights,
        }
