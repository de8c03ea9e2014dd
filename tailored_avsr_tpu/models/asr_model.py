"""Hybrid CTC/attention E2E model for ASR (audio) and VSR (video).

Capability parity with ``ESPnetASRModel`` (/root/reference/src/models/
espnet_model.py): encode() = frontend -> specaug (train only) -> normalize ->
preencoder -> encoder -> postencoder; loss = ctc_weight * CTC +
(1 - ctc_weight) * label-smoothed attention CE, with optional interCTC mixed
into the CTC term (:261-304) and per-layer stats.

Functional differences from the reference (TPU-first):
- forward is pure: (loss, stats, aux) are returned; train-time CER/WER text
  metrics are computed on host from the returned CTC argmax (the reference's
  ErrorCalculator runs on host too — same boundary, made explicit).
- all randomness (specaug, dropout, stochastic depth, branch drop) rides on
  flax rng collections {'dropout', 'specaug', 'skip'}.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.models.ctc import CTCHead
from tailored_avsr_tpu.ops.rnnt import rnnt_loss
from tailored_avsr_tpu.ops.losses import (
    add_sos_eos,
    label_smoothing_loss,
    token_accuracy,
)
from tailored_avsr_tpu.ops.masking import make_valid_mask


class ASRModel(nn.Module):
    vocab_size: int
    encoder: nn.Module
    ctc: CTCHead
    decoder: Optional[nn.Module] = None
    frontend: Optional[nn.Module] = None
    specaug: Optional[nn.Module] = None
    normalize: Optional[nn.Module] = None
    preencoder: Optional[nn.Module] = None
    postencoder: Optional[nn.Module] = None
    joint_network: Optional[nn.Module] = None  # transducer branch (optional
    prediction_network: Optional[nn.Module] = None  # path, ref :306-328)
    # multi-blank transducer (ref src/models/espnet_model.py:130-141): big
    # blanks <blank{d}> sit just before <blank> in the token list (the task
    # factory inserts them, ref src/tasks/asr.py:496-502); empty = standard
    transducer_multi_blank_durations: Tuple[int, ...] = ()
    transducer_multi_blank_sigma: float = 0.05
    ctc_weight: float = 0.5
    interctc_weight: float = 0.0
    ignore_id: int = -1
    lsm_weight: float = 0.0
    length_normalized_loss: bool = False
    # sos = eos = vocab_size - 1 ("<sos/eos>" is the last token, espnet convention)

    @property
    def sos(self) -> int:
        return self.vocab_size - 1

    @property
    def eos(self) -> int:
        return self.vocab_size - 1

    def _extract_feats(self, speech, lengths, deterministic):
        if self.frontend is None:
            return speech, lengths
        # visual frontends carry BatchNorm -> need the train flag
        if hasattr(self.frontend, "bn_axis_name"):
            return self.frontend(speech, lengths, train=not deterministic)
        return self.frontend(speech, lengths)

    def encode(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        *,
        deterministic: bool = True,
    ):
        """Returns (encoder_out, encoder_out_lens, aux)."""
        feats, feats_lengths = self._extract_feats(speech, speech_lengths, deterministic)
        if self.specaug is not None and not deterministic:
            feats, feats_lengths = self.specaug(feats, feats_lengths)
        if self.normalize is not None:
            feats, feats_lengths = self.normalize(feats, feats_lengths)
        if self.preencoder is not None:
            feats, feats_lengths = self.preencoder(
                feats, feats_lengths, deterministic=deterministic
            )
        enc_out, enc_lens, aux = self.encoder(
            feats,
            feats_lengths,
            deterministic=deterministic,
            ctc=self.ctc if getattr(self.encoder, "interctc_use_conditioning", False) else None,
        )
        if self.postencoder is not None:
            # interCTC taps keep the encoder-native time axis
            aux = dict(aux or {}, interctc_lens=enc_lens)
            enc_out, enc_lens = self.postencoder(enc_out, enc_lens)
        return enc_out, enc_lens, aux

    def _calc_att_loss(self, enc_out, enc_lens, text, text_lengths, deterministic):
        ys_in, ys_out = add_sos_eos(text, self.sos, self.eos, self.ignore_id)
        ys_in_lens = text_lengths + 1
        memory_mask = make_valid_mask(enc_lens, enc_out.shape[1])
        logits = self.decoder(
            enc_out, memory_mask, ys_in, ys_in_lens, deterministic=deterministic
        )
        loss_att = label_smoothing_loss(
            logits, ys_out, self.lsm_weight, self.ignore_id, self.length_normalized_loss
        )
        acc = token_accuracy(logits, ys_out, self.ignore_id)
        return loss_att, acc

    def __call__(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        *,
        deterministic: bool = True,
        return_ctc_argmax: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        enc_out, enc_lens, enc_aux = self.encode(
            speech, speech_lengths, deterministic=deterministic
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
            # transducer branch: loss = rnnt + ctc_weight * ctc (ref :330-335)
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
        if enc_aux and enc_aux.get("branch_weights"):
            stats["branch_weights"] = enc_aux["branch_weights"]
        return loss, stats

    def _calc_transducer_loss(self, enc_out, enc_lens, text, text_lengths, deterministic):
        g = self.prediction_network(text, deterministic=deterministic)
        logits = self.joint_network(enc_out[:, :, None, :], g[:, None, :, :])
        durs = self.transducer_multi_blank_durations
        if durs:
            # big blanks occupy indices blank_id-1-i (the task factory put
            # <blank{d}> just before <blank>, which itself moved from 0 to
            # len(durs) — ref src/tasks/asr.py:495-502, espnet_model.py:130-141)
            from tailored_avsr_tpu.ops.rnnt import multiblank_rnnt_loss

            return multiblank_rnnt_loss(
                logits, enc_lens, text, text_lengths,
                blank_id=len(durs), durations=durs,
                sigma=self.transducer_multi_blank_sigma,
            )
        return rnnt_loss(logits, enc_lens, text, text_lengths)

    # ---- inference helpers (used by decode/) -------------------------------

    def ctc_greedy(self, speech, speech_lengths):
        """Greedy CTC token ids (pre duplicate/blank collapse) + lengths."""
        enc_out, enc_lens, _ = self.encode(speech, speech_lengths)
        return self.ctc.argmax(enc_out), enc_lens

    def ctc_logprobs(self, speech, speech_lengths):
        enc_out, enc_lens, _ = self.encode(speech, speech_lengths)
        return self.ctc.log_softmax(enc_out), enc_lens

    def decoder_score_step(self, memory, memory_mask, ys, pos):
        """One-step decoder log-probs for beam search."""
        return self.decoder.score_step(memory, memory_mask, ys, pos)

    def nll(
        self,
        enc_out: jnp.ndarray,
        enc_lens: jnp.ndarray,
        ys_pad: jnp.ndarray,
        ys_lens: jnp.ndarray,
    ) -> jnp.ndarray:
        """Per-utterance negative log-likelihood of ys under the attention
        decoder (ref espnet_model.py:451-534, used for LM-style rescoring)."""
        ys_in, ys_out = add_sos_eos(ys_pad, self.sos, self.eos, self.ignore_id)
        memory_mask = make_valid_mask(enc_lens, enc_out.shape[1])
        logits = self.decoder(enc_out, memory_mask, ys_in, ys_lens + 1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        valid = ys_out != self.ignore_id
        tgt = jnp.where(valid, ys_out, 0)
        tok_ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1).squeeze(-1)
        return -jnp.sum(tok_ll * valid, axis=-1)
