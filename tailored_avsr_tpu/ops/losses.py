"""Training losses/metrics: CTC, label smoothing, accuracy, sos/eos packing.

Capability parity with:
- CTC head semantics of /root/reference/src/ctc/ctc.py:40-68 ('builtin',
  zero_infinity, batch-size-mean reduction) — the DP itself is optax's native
  JAX CTC (log-space forward algorithm, static shapes, TPU-friendly).
- espnet ``LabelSmoothingLoss`` (KL-divergence form, including the constant
  target-entropy term, normalized by batch when length_normalized_loss=False)
  as used at /root/reference/src/models/espnet_model.py:175-180.
- espnet ``th_accuracy`` and ``add_sos_eos``
  (/root/reference/src/models/avsr_espnet_model.py:25-30).

Static-shape convention for targets: ``text`` is (B, L) padded with
``ignore_id`` (-1); sos/eos packing produces fixed (B, L+1) tensors.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    reduce: bool = True,
) -> jnp.ndarray:
    """Batch-mean CTC loss (or per-sequence with ``reduce=False``, used by the
    PIT permutation search). logits: (B, T, V); labels: (B, L) (>=0 valid)."""
    b, t, _ = logits.shape
    logit_pad = (
        jnp.arange(t)[None, :] >= logit_lengths[:, None]
    ).astype(jnp.float32)
    l = labels.shape[1]
    label_pad = (
        jnp.arange(l)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    # optax wants non-negative label ids even in padding
    safe_labels = jnp.where(labels >= 0, labels, 0)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32), logit_pad, safe_labels, label_pad, blank_id=blank_id
    )
    # zero_infinity semantics (torch CTCLoss, ref src/ctc/ctc.py:40-43): an
    # utterance whose label cannot be aligned (T < L + #adjacent-repeats)
    # has infinite loss in exact CTC; optax instead returns a huge finite
    # value via log_epsilon. Zero those out like the reference.
    valid_lab = (jnp.arange(l)[None, :] < label_lengths[:, None]) & (labels >= 0)
    prev = jnp.concatenate([jnp.full((b, 1), -1, labels.dtype), safe_labels[:, :-1]], axis=1)
    repeats = jnp.sum(((safe_labels == prev) & valid_lab & (jnp.arange(l)[None, :] > 0)), axis=-1)
    feasible = logit_lengths >= label_lengths + repeats
    per_seq = jnp.where(feasible, per_seq, 0.0)
    if not reduce:
        return per_seq
    return jnp.sum(per_seq) / b


def add_sos_eos(
    text: jnp.ndarray, sos: int, eos: int, ignore_id: int = -1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L) ignore-padded -> (ys_in (B, L+1) eos-padded, ys_out (B, L+1) ignore-padded).

    ys_in  = [sos, y1..yn, eos, eos...]   (pad value = eos, as espnet pad_list does)
    ys_out = [y1..yn, eos, ignore...]
    """
    b, l = text.shape
    valid = text != ignore_id
    lengths = jnp.sum(valid.astype(jnp.int32), axis=-1)
    ys = jnp.where(valid, text, eos)
    sos_col = jnp.full((b, 1), sos, dtype=text.dtype)
    ys_in = jnp.concatenate([sos_col, ys], axis=-1)
    pos = jnp.arange(l + 1)[None, :]
    ys_out = jnp.concatenate([ys, jnp.full((b, 1), eos, dtype=text.dtype)], axis=-1)
    # place eos at position `lengths`, ignore beyond
    ys_out = jnp.where(pos == lengths[:, None], eos, ys_out)
    ys_out = jnp.where(pos > lengths[:, None], ignore_id, ys_out)
    return ys_in, ys_out


def label_smoothing_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.1,
    ignore_id: int = -1,
    normalize_length: bool = False,
) -> jnp.ndarray:
    """espnet-style KL label smoothing.

    true_dist = smoothing/(V-1) everywhere, confidence at the target;
    loss = sum over valid tokens of KL(true || softmax(logits)), divided by the
    batch size (normalize_length=False) or the valid-token count.
    """
    v = logits.shape[-1]
    confidence = 1.0 - smoothing
    low = smoothing / (v - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = targets != ignore_id
    tgt = jnp.where(valid, targets, 0)
    true_dist = jnp.full(logits.shape, low, dtype=jnp.float32)
    true_dist = jnp.where(
        jax.nn.one_hot(tgt, v, dtype=bool), confidence, true_dist
    )
    # KLDiv including the constant sum p*log p term (matches torch KLDivLoss);
    # 0 * log(0) -> 0 so smoothing = 0 degrades to plain cross-entropy
    kl = jnp.where(
        true_dist > 0.0,
        true_dist * (jnp.log(jnp.maximum(true_dist, 1e-30)) - logp),
        0.0,
    )
    kl = jnp.sum(kl, axis=-1) * valid.astype(jnp.float32)
    denom = jnp.sum(valid) if normalize_length else targets.shape[0]
    return jnp.sum(kl) / denom


def token_accuracy(
    logits: jnp.ndarray, targets: jnp.ndarray, ignore_id: int = -1
) -> jnp.ndarray:
    """Fraction of correctly-predicted non-ignored tokens."""
    pred = jnp.argmax(logits, axis=-1)
    valid = targets != ignore_id
    correct = jnp.sum((pred == targets) & valid)
    return correct / jnp.maximum(jnp.sum(valid), 1)
