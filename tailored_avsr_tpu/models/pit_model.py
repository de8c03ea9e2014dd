"""Permutation-invariant-training (PIT) multi-speaker ASR model.

Capability parity with the reference's ``pit_espnet`` model choice
(/root/reference/src/tasks/asr.py:125-134, which registers espnet's
``pit_espnet_model.ESPnetASRModel``): the encoder emits ``num_inf`` per-speaker
encodings (see ``MultiSpeakerTransformerEncoder``); training computes the CTC
loss for every (hypothesis, reference) speaker pair, picks the minimum-loss
permutation per utterance, and trains CTC + attention on that alignment.

TPU-first notes:
- the permutation search is fully tensorized: the (S_inf, S_ref, B) pair-loss
  matrix comes from per-sequence CTC (``reduce=False``), permutations are
  enumerated statically (S is tiny), and the per-utterance argmin + reference
  gather stay inside the jitted graph — no host-side assignment loop.
- the attention loss folds (batch, speaker) into one batch axis so the decoder
  runs a single large GEMM-friendly forward instead of S small ones.

Target layout: ``text`` is (B, num_ref, L) ignore-padded, ``text_lengths`` is
(B, num_ref) — the multi-speaker twin of the single-speaker (B, L) contract.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from tailored_avsr_tpu.models.asr_model import ASRModel


class PITASRModel(ASRModel):
    num_inf: int = 2
    num_ref: int = 2

    def __call__(  # type: ignore[override]
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,  # (B, num_ref, L)
        text_lengths: jnp.ndarray,  # (B, num_ref)
        *,
        deterministic: bool = True,
        return_ctc_argmax: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        assert self.num_inf == self.num_ref, "PIT requires num_inf == num_ref"
        enc_out, enc_lens, _ = self.encode(
            speech, speech_lengths, deterministic=deterministic
        )  # (B, S, T, D)
        b, s = enc_out.shape[0], enc_out.shape[1]
        assert s == self.num_inf, (s, self.num_inf)

        # (S_inf, S_ref, B) per-utterance CTC pair losses
        loss_mat = jnp.stack(
            [
                jnp.stack(
                    [
                        self.ctc.loss(
                            enc_out[:, i], enc_lens, text[:, j], text_lengths[:, j],
                            deterministic=deterministic, reduce=False,
                        )
                        for j in range(self.num_ref)
                    ]
                )
                for i in range(self.num_inf)
            ]
        )
        perms = list(itertools.permutations(range(self.num_ref)))
        # (P, B): speaker-mean pair loss under each permutation
        perm_losses = jnp.stack(
            [sum(loss_mat[i, p[i]] for i in range(self.num_inf)) for p in perms]
        ) / self.num_inf
        best = jnp.argmin(perm_losses, axis=0)  # (B,)
        loss_ctc = jnp.mean(jnp.min(perm_losses, axis=0))
        best_perm = jnp.asarray(perms, jnp.int32)[best]  # (B, S)

        # permute references to the best assignment, fold speakers into batch
        text_perm = jnp.take_along_axis(text, best_perm[:, :, None], axis=1)
        tlen_perm = jnp.take_along_axis(text_lengths, best_perm, axis=1)
        enc_flat = enc_out.reshape((b * s,) + enc_out.shape[2:])
        lens_flat = jnp.repeat(enc_lens, s)
        text_flat = text_perm.reshape(b * s, -1)
        tlen_flat = tlen_perm.reshape(b * s)

        stats: Dict[str, Any] = {"loss_ctc": loss_ctc}
        if self.ctc_weight == 1.0 or self.decoder is None:
            loss = loss_ctc
        else:
            loss_att, acc = self._calc_att_loss(
                enc_flat, lens_flat, text_flat, tlen_flat, deterministic
            )
            stats["loss_att"] = loss_att
            stats["acc"] = acc
            loss = (
                loss_att
                if self.ctc_weight == 0.0
                else self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
            )
        stats["loss"] = loss
        if return_ctc_argmax:
            stats["ctc_argmax"] = self.ctc.argmax(enc_flat).reshape(b, s, -1)
            stats["ctc_argmax_lens"] = enc_lens
        return loss, stats
