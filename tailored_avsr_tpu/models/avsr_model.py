"""Hybrid CTC/attention E2E model for audio-visual speech recognition.

Capability parity with ``ESPnetAVSRModel`` (/root/reference/src/models/
avsr_espnet_model.py): dual-stream encode() (:383-488) — per-modality
frontends, specaug+MVN on audio only, embed layers, temporal alignment by
padding the shorter stream to the longer (:512-541, pad value = ignore_id),
per-modality pos-enc, unified encoder (tailored/conventional), adaptive
audio-visual fusion — and the same hybrid CTC/attention + interCTC loss as
the ASR model.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tailored_avsr_tpu.models.asr_model import ASRModel
from tailored_avsr_tpu.models.ctc import CTCHead
from tailored_avsr_tpu.ops.masking import make_valid_mask


class AVSRModel(nn.Module):
    vocab_size: int
    encoder: nn.Module  # TailoredEncoder | ConventionalEncoder
    audiovisual_fusion: nn.Module
    ctc: CTCHead
    acoustic_embed: nn.Module
    visual_embed: nn.Module
    decoder: Optional[nn.Module] = None
    acoustic_frontend: Optional[nn.Module] = None
    visual_frontend: Optional[nn.Module] = None
    specaug: Optional[nn.Module] = None
    normalize: Optional[nn.Module] = None
    acoustic_preencoder: Optional[nn.Module] = None
    visual_preencoder: Optional[nn.Module] = None
    postencoder: Optional[nn.Module] = None
    joint_network: Optional[nn.Module] = None
    prediction_network: Optional[nn.Module] = None
    # multi-blank transducer (ref src/models/avsr_espnet_model.py:142-153)
    transducer_multi_blank_durations: Tuple[int, ...] = ()
    transducer_multi_blank_sigma: float = 0.05
    ctc_weight: float = 0.5
    interctc_weight: float = 0.0
    ignore_id: int = -1
    lsm_weight: float = 0.0
    length_normalized_loss: bool = False

    @property
    def sos(self) -> int:
        return self.vocab_size - 1

    @property
    def eos(self) -> int:
        return self.vocab_size - 1

    def _extract(self, frontend, x, lengths, deterministic):
        if frontend is None:
            return x, lengths
        if hasattr(frontend, "bn_axis_name"):
            return frontend(x, lengths, train=not deterministic)
        return frontend(x, lengths)

    @staticmethod
    def _align(a, a_mask, v, v_mask, pad_value: float):
        """Pad the shorter stream (buffer-wise) to the longer with ``pad_value``.

        With static batch buffers, alignment reduces to equalizing the two time
        axes; per-utterance validity stays in the masks (ref :512-541 pads the
        padded *values* with ignore_id = -1; we reproduce that so cgMLP conv
        boundary bleed matches).
        """
        la, lv = a.shape[1], v.shape[1]
        if la < lv:
            a = jnp.pad(a, ((0, 0), (0, lv - la), (0, 0)), constant_values=pad_value)
            a_mask = jnp.pad(a_mask, ((0, 0), (0, lv - la)), constant_values=False)
        elif lv < la:
            v = jnp.pad(v, ((0, 0), (0, la - lv), (0, 0)), constant_values=pad_value)
            v_mask = jnp.pad(v_mask, ((0, 0), (0, la - lv)), constant_values=False)
        return a, a_mask, v, v_mask

    def encode(
        self,
        audio: jnp.ndarray,
        audio_lengths: jnp.ndarray,
        video: jnp.ndarray,
        video_lengths: jnp.ndarray,
        *,
        deterministic: bool = True,
    ):
        """Returns (encoder_out, encoder_out_lens, aux)."""
        a_feats, a_lens = self._extract(
            self.acoustic_frontend, audio, audio_lengths, deterministic
        )
        v_feats, v_lens = self._extract(
            self.visual_frontend, video, video_lengths, deterministic
        )
        if self.specaug is not None and not deterministic:
            a_feats, a_lens = self.specaug(a_feats, a_lens)
        if self.normalize is not None:
            a_feats, a_lens = self.normalize(a_feats, a_lens)
        if self.acoustic_preencoder is not None:
            a_feats, a_lens = self.acoustic_preencoder(
                a_feats, a_lens, deterministic=deterministic
            )
        if self.visual_preencoder is not None:
            v_feats, v_lens = self.visual_preencoder(
                v_feats, v_lens, deterministic=deterministic
            )

        a_feats, a_lens = self.acoustic_embed.apply_embed_layer(
            a_feats, a_lens, deterministic=deterministic
        )
        v_feats, v_lens = self.visual_embed.apply_embed_layer(
            v_feats, v_lens, deterministic=deterministic
        )
        a_mask = make_valid_mask(a_lens, a_feats.shape[1])
        v_mask = make_valid_mask(v_lens, v_feats.shape[1])
        a_feats, a_mask, v_feats, v_mask = self._align(
            a_feats, a_mask, v_feats, v_mask, float(self.ignore_id)
        )
        a_feats, a_pos = self.acoustic_embed.apply_pos_enc(
            a_feats, deterministic=deterministic
        )
        v_feats, v_pos = self.visual_embed.apply_pos_enc(
            v_feats, deterministic=deterministic
        )

        use_interctc = len(tuple(self.encoder.interctc_layer_idx)) > 0
        a_out, a_mask, v_out, v_mask, enc_aux = self.encoder(
            a_feats, a_pos, a_mask,
            v_feats, v_pos, v_mask,
            deterministic=deterministic,
            ctc=self.ctc if self.encoder.interctc_use_conditioning else None,
            audiovisual_fusion=self.audiovisual_fusion if use_interctc else None,
        )
        enc_out, av_mask, fusion_aux = self.audiovisual_fusion(
            a_out, a_mask, v_out, v_mask, deterministic=deterministic
        )
        enc_lens = jnp.sum(av_mask.astype(jnp.int32), axis=-1)
        if self.postencoder is not None:
            # interCTC taps keep the encoder-native time axis
            enc_aux = dict(enc_aux or {}, interctc_lens=enc_lens)
            enc_out, enc_lens = self.postencoder(enc_out, enc_lens)
        aux = dict(enc_aux or {})
        aux["fusion_weights"] = fusion_aux
        return enc_out, enc_lens, aux

    # reuse the loss structure of ASRModel via composition
    _calc_att_loss = ASRModel._calc_att_loss
    _calc_transducer_loss = ASRModel._calc_transducer_loss
    nll = ASRModel.nll

    def __call__(
        self,
        audio: jnp.ndarray,
        audio_lengths: jnp.ndarray,
        video: jnp.ndarray,
        video_lengths: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        *,
        deterministic: bool = True,
        return_ctc_argmax: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        enc_out, enc_lens, enc_aux = self.encode(
            audio, audio_lengths, video, video_lengths, deterministic=deterministic
        )
        stats: Dict[str, Any] = {}
        loss_ctc = None
        if self.ctc_weight != 0.0:
            loss_ctc = self.ctc.loss(
                enc_out, enc_lens, text, text_lengths, deterministic=deterministic
            )
            stats["loss_ctc"] = loss_ctc
        intermediates = enc_aux.get("intermediate_outs", []) if enc_aux else []
        if self.interctc_weight != 0.0 and intermediates:
            # intermediate taps are PRE-postencoder: use the encoder-native
            # lengths recorded in aux if a postencoder changed the time axis
            inter_lens = (
                enc_aux.get("interctc_lens", enc_lens) if enc_aux else enc_lens
            )
            loss_interctc = 0.0
            for layer_idx, inter_out in intermediates:
                loss_ic = self.ctc.loss(
                    inter_out, inter_lens, text, text_lengths,
                    deterministic=deterministic,
                )
                stats[f"loss_interctc_layer{layer_idx}"] = loss_ic
                loss_interctc = loss_interctc + loss_ic
            loss_interctc = loss_interctc / len(intermediates)
            # ctc_weight may be 0 (attention + interCTC only): the interCTC
            # term then stands alone instead of dereferencing a None loss
            if loss_ctc is None:
                loss_ctc = loss_interctc
            else:
                loss_ctc = (
                    1 - self.interctc_weight
                ) * loss_ctc + self.interctc_weight * loss_interctc

        if self.joint_network is not None:
            loss_transducer = self._calc_transducer_loss(
                enc_out, enc_lens, text, text_lengths, deterministic
            )
            stats["loss_transducer"] = loss_transducer
            loss = (
                loss_transducer + self.ctc_weight * loss_ctc
                if loss_ctc is not None
                else loss_transducer
            )
        elif self.ctc_weight == 1.0 or self.decoder is None:
            loss = loss_ctc
        else:
            loss_att, acc = self._calc_att_loss(
                enc_out, enc_lens, text, text_lengths, deterministic
            )
            stats["loss_att"] = loss_att
            stats["acc"] = acc
            if self.ctc_weight == 0.0:
                # loss_ctc may hold a standalone interCTC term (ctc_weight 0
                # with interctc taps): mix it by interctc_weight
                loss = (
                    loss_att
                    if loss_ctc is None
                    else (1 - self.interctc_weight) * loss_att
                    + self.interctc_weight * loss_ctc
                )
            else:
                loss = self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
        stats["loss"] = loss
        if return_ctc_argmax:
            stats["ctc_argmax"] = self.ctc.argmax(enc_out)
            stats["ctc_argmax_lens"] = enc_lens
        if enc_aux and enc_aux.get("fusion_weights"):
            stats["fusion_weights"] = enc_aux["fusion_weights"]
        return loss, stats

    def ctc_greedy(self, audio, audio_lengths, video, video_lengths):
        enc_out, enc_lens, _ = self.encode(audio, audio_lengths, video, video_lengths)
        return self.ctc.argmax(enc_out), enc_lens

    def decoder_score_step(self, memory, memory_mask, ys, pos):
        return self.decoder.score_step(memory, memory_mask, ys, pos)
