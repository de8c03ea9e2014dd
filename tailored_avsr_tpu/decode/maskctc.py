"""Mask-CTC non-autoregressive decoding: CTC greedy -> mask low-confidence
tokens -> K iterative MLM refinement rounds.

Capability parity with ``MaskCTCInference`` (/root/reference/src/models/
maskctc_model.py:285-349): collapse the CTC best path keeping the max
per-segment posterior, mask tokens whose posterior < threshold, then over
``num_iterations`` rounds fill the ``mask_num // K`` highest-confidence MLM
predictions per round (final round fills the rest).

Fully jittable (the reference notes this path is the ideal jit target —
fixed iteration count, no beam): the duplicate-collapse is a segment-max +
stable left-pack by argsort, all static shapes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e10


class MaskCTCResult(NamedTuple):
    tokens: jnp.ndarray  # (B, T) token ids, right-padded with pad_id
    lengths: jnp.ndarray  # (B,)


def _collapse_row(probs, ids, length, blank_id, pad_id):
    """One utterance: (T,) max-probs + argmax ids -> packed tokens + seg probs."""
    t = ids.shape[0]
    pos = jnp.arange(t)
    valid_frame = pos < length
    prev = jnp.concatenate([jnp.full((1,), -1, ids.dtype), ids[:-1]])
    seg_start = (ids != prev) & valid_frame
    seg_id = jnp.cumsum(seg_start.astype(jnp.int32)) - 1  # (T,)
    seg_max = jax.ops.segment_max(
        jnp.where(valid_frame, probs, NEG_INF), seg_id, num_segments=t
    )  # (T,) max posterior per segment
    keep = seg_start & (ids != blank_id)
    # stable left-pack of kept segment-start positions
    order = jnp.argsort(jnp.where(keep, pos, t + pos))
    packed_ids = jnp.where(keep[order], ids[order], pad_id)
    packed_probs = jnp.where(keep[order], seg_max[seg_id][order], 0.0)
    n = jnp.sum(keep.astype(jnp.int32))
    return packed_ids, packed_probs, n


def maskctc_decode(
    ctc_logp: jnp.ndarray,  # (B, T, V) log-softmax CTC posteriors
    enc_lens: jnp.ndarray,  # (B,)
    mlm_score_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    mask_token: int,
    threshold: float = 0.999,
    num_iterations: int = 10,
    blank_id: int = 0,
    eos: int = None,
) -> MaskCTCResult:
    """mlm_score_fn(ys_in (B, T+1), lengths (B,)) -> (B, T+1, V') MLM logits.

    ``eos`` (default vocab_size - 1, the espnet <sos/eos> convention) is
    appended inside the valid length before every MLM call — training packs
    inputs as [tokens..., eos] with lengths + 1 (models/maskctc.py
    mask_uniform), so decoding must condition on the same distribution.
    """
    b, t, v = ctc_logp.shape
    if eos is None:
        eos = v - 1
    num_iterations = max(1, num_iterations)
    probs = jnp.exp(jnp.max(ctc_logp, axis=-1))  # (B, T)
    ids = jnp.argmax(ctc_logp, axis=-1).astype(jnp.int32)
    tokens, tok_probs, lengths = jax.vmap(
        lambda p, i, l: _collapse_row(p, i, l, blank_id, mask_token)
    )(probs, ids, enc_lens)
    # pad positions use mask_token as pad (MLM never reads beyond lengths)

    pos = jnp.arange(t)[None, :]
    in_range = pos < lengths[:, None]
    masked0 = (tok_probs < threshold) & in_range
    ys = jnp.where(masked0, mask_token, tokens)
    # MLM input buffer has room for the trailing eos even at full length
    pos1 = jnp.arange(t + 1)[None, :]
    ys = jnp.concatenate(
        [ys, jnp.full((b, 1), mask_token, ys.dtype)], axis=-1
    )
    ys = jnp.where(pos1 == lengths[:, None], eos, ys)
    masked0 = jnp.concatenate([masked0, jnp.zeros((b, 1), bool)], axis=-1)
    mask_num = jnp.sum(masked0.astype(jnp.int32), axis=-1)  # (B,)
    # espnet fills mask_num // K per round, but switches to one-per-round
    # when mask_num < K (ref maskctc_model.py:325-338) — later fills then
    # condition on earlier ones instead of degenerating to one-shot filling
    per_round = jnp.maximum(
        mask_num // num_iterations, jnp.minimum(mask_num, 1)
    )

    def round_step(j, carry):
        ys, masked = carry
        logits = mlm_score_fn(ys, lengths + 1)
        logits = logits[..., :v]  # ignore the <mask> logit if present
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pred_prob = jnp.max(jax.nn.softmax(logits.astype(jnp.float32), -1), axis=-1)
        score = jnp.where(masked, pred_prob, NEG_INF)
        # rank masked positions by confidence (desc)
        rank = jnp.argsort(jnp.argsort(-score, axis=-1), axis=-1)
        is_last = j == num_iterations - 1
        fill_k = jnp.where(is_last, jnp.full_like(per_round, t + 1), per_round)
        fill = masked & (rank < fill_k[:, None])
        ys = jnp.where(fill, pred, ys)
        masked = masked & ~fill
        return ys, masked

    ys, _ = jax.lax.fori_loop(0, num_iterations, round_step, (ys, masked0))
    return MaskCTCResult(tokens=ys[:, :t], lengths=lengths)
