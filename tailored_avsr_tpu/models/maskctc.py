"""Mask-CTC models: joint CTC + conditional-MLM training (non-autoregressive).

Capability parity with /root/reference/src/models/maskctc_model.py (ASR) and
avsr_maskctc_model.py (AVSR): a ``<mask>`` token is appended to the vocabulary
(mask_token = vocab_size); the attention branch becomes an MLM loss over
uniformly masked target tokens (espnet ``mask_uniform``: per utterance, the
number of masked positions is uniform in [1, len]); the iterative-refinement
decoder lives in decode/maskctc.py.

The uniform masking is re-expressed static-shape: draw one uniform score per
position, mask the ``num_mask`` smallest-scored valid positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tailored_avsr_tpu.models.asr_model import ASRModel
from tailored_avsr_tpu.models.avsr_model import AVSRModel
from tailored_avsr_tpu.ops.losses import label_smoothing_loss, token_accuracy
from tailored_avsr_tpu.ops.masking import make_valid_mask


def mask_uniform(
    text: jnp.ndarray,
    text_lengths: jnp.ndarray,
    mask_token: int,
    eos: int,
    ignore_id: int,
    rng: jax.Array,
):
    """Static-shape espnet ``mask_uniform``.

    Returns (ys_in (B, L+1) with <mask> substitutions and eos appended,
    ys_out (B, L+1) = original tokens at masked positions else ignore_id).
    The reference masks within [tokens + eos]? espnet masks only the real
    tokens; we append eos to ys_in (never masked) to keep the MLM conditioned
    on sequence end, matching espnet's add_sos_eos-free MLM packing.
    """
    b, l = text.shape
    k1, k2 = jax.random.split(rng)
    valid = text != ignore_id
    # number of masks per utterance: uniform in [1, len]
    u = jax.random.uniform(k1, (b,))
    num_mask = 1 + jnp.floor(u * text_lengths.astype(jnp.float32)).astype(jnp.int32)
    num_mask = jnp.minimum(num_mask, jnp.maximum(text_lengths, 1))
    scores = jax.random.uniform(k2, (b, l))
    scores = jnp.where(valid, scores, jnp.inf)
    order = jnp.argsort(scores, axis=-1)  # ascending; invalid last
    ranks = jnp.argsort(order, axis=-1)
    to_mask = (ranks < num_mask[:, None]) & valid
    ys_in = jnp.where(to_mask, mask_token, jnp.where(valid, text, eos))
    ys_out = jnp.where(to_mask, text, ignore_id)
    eos_col = jnp.full((b, 1), eos, dtype=text.dtype)
    ign_col = jnp.full((b, 1), ignore_id, dtype=text.dtype)
    return (
        jnp.concatenate([ys_in, eos_col], axis=-1),
        jnp.concatenate([ys_out, ign_col], axis=-1),
    )


class _MaskCTCMixin:
    """Replaces the attention loss with the MLM loss over masked tokens."""

    @property
    def mask_token(self) -> int:
        return self.vocab_size  # one past the original vocabulary

    def _calc_att_loss(self, enc_out, enc_lens, text, text_lengths, deterministic):
        rng = (
            self.make_rng("mlm")
            if not deterministic
            else jax.random.PRNGKey(0)  # deterministic eval masking
        )
        ys_in, ys_out = mask_uniform(
            text, text_lengths, self.mask_token, self.eos, self.ignore_id, rng
        )
        ys_in_lens = text_lengths + 1
        memory_mask = make_valid_mask(enc_lens, enc_out.shape[1])
        logits = self.decoder(
            enc_out, memory_mask, ys_in, ys_in_lens, deterministic=deterministic
        )
        loss_mlm = label_smoothing_loss(
            logits, ys_out, self.lsm_weight, self.ignore_id, self.length_normalized_loss
        )
        acc = token_accuracy(logits, ys_out, self.ignore_id)
        return loss_mlm, acc


class MaskCTCModel(_MaskCTCMixin, ASRModel):
    pass


class AVSRMaskCTCModel(_MaskCTCMixin, AVSRModel):
    pass
