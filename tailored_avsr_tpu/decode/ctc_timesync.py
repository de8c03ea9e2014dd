"""Time-synchronous (frame-synchronous) CTC prefix beam search, jittable.

Capability parity with espnet's ``BeamSearchTimeSync`` choice imported by the
reference (/root/reference/src/inference/avsr_inference.py:33-41): decoding
advances over encoder FRAMES (not output labels), maintaining per-prefix
blank/non-blank probabilities (Hannun et al. 2014 prefix beam search), with
shallow fusion and a final attention-decoder rescoring pass (the label-sync
in-loop decoder scoring is the job of decode/beam_search.py; time-sync +
attention RESCORING is the WeNet/U2-style TPU-friendly equivalent — one
batched decoder pass over the n-best instead of a decoder step per frame).

TPU-first design — everything is fixed-shape inside one ``lax.fori_loop``:
- K beams live as a (B, K, Lmax) token buffer + per-beam (log_pb, log_pnb).
- each frame proposes K stay-candidates (blank / repeat-last) and K * P
  extension candidates (P = pre-beam top-P tokens of the frame posterior).
- duplicate prefixes (e.g. "AB"+stay vs "A"+B) are merged exactly: prefixes
  carry two independent rolling hashes; candidates are sorted by hash and
  adjacent equal-hash runs are segment-logsumexp'ed — a sort-based group-by,
  the same argsort-packing trick decode/maskctc.py uses, no host round trip.
- shallow fusion in-loop: a jittable stateless scorer over the last-N tokens
  (the dense ARPA n-gram table of decode/ngram.py) + word-insertion bonus.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30
_H1, _H2 = jnp.uint32(1000003), jnp.uint32(10000019)  # rolling-hash multipliers


def _gather_beams(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis over the beam axis (1) for 2-D or higher-rank state."""
    if x.ndim > 2:
        idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    return jnp.where(
        (a <= NEG_INF) & (b <= NEG_INF),
        NEG_INF,
        m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe)),
    )


def timesync_init_state(b: int, beam_size: int, max_len: int):
    """Fresh search state: one live empty-prefix beam per utterance.

    The state tuple is chunk-chainable — feed successive frame chunks to
    ``ctc_timesync_chunk`` and the result is identical to one pass over the
    concatenated frames (the streaming partial-hypothesis surface)."""
    k = beam_size
    tokens = jnp.zeros((b, k, max_len), jnp.int32)
    tok_len = jnp.zeros((b, k), jnp.int32)
    # beam 0 = empty prefix; the rest are dead (-inf, distinct hashes so they
    # never merge with anything real)
    log_pb = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)
    log_pnb = jnp.full((b, k), NEG_INF)
    fusion = jnp.zeros((b, k))  # accumulated ngram + penalty terms
    h1 = jnp.broadcast_to(jnp.arange(1, k + 1, dtype=jnp.uint32)[None], (b, k))
    h2 = h1 * jnp.uint32(2654435761)
    last = jnp.full((b, k), -1, jnp.int32)
    return (tokens, tok_len, log_pb, log_pnb, fusion, h1, h2, last)


def timesync_best(state):
    """(tokens (B, K, L), lengths (B, K), scores, ctc_scores) best-first."""
    tokens, tok_len, log_pb, log_pnb, fusion, _, _, _ = state
    ctc_score = _logaddexp(log_pb, log_pnb)
    score = ctc_score + fusion
    order = jnp.argsort(-score, axis=1)
    return (
        _gather_beams(tokens, order),
        _gather_beams(tok_len, order),
        _gather_beams(score, order),
        _gather_beams(ctc_score, order),
    )


@partial(
    jax.jit,
    static_argnames=(
        "beam_size", "pre_beam", "blank_id", "max_len", "penalty",
        "ngram_scorer", "ngram_weight",
    ),
)
def ctc_timesync_beam_search(
    log_probs: jnp.ndarray,  # (B, T, V) CTC log-softmax
    lengths: jnp.ndarray,  # (B,)
    beam_size: int = 10,
    pre_beam: int = 10,
    blank_id: int = 0,
    max_len: int = 200,
    penalty: float = 0.0,  # length (insertion) bonus per emitted token
    ngram_scorer: Optional[Callable] = None,  # (tokens (N,L), lens (N,), cand (N,)) -> (N,)
    ngram_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (tokens (B, K, max_len), token_lengths (B, K), scores (B, K),
    ctc_scores (B, K)) sorted best-first by ``scores`` = log P_ctc(prefix) +
    fusion (insertion bonus + weighted n-gram); ``ctc_scores`` is the pure
    log P_ctc term so callers can re-weight the components."""
    b, t, v = log_probs.shape
    state = timesync_init_state(b, beam_size, max_len)
    step = _make_step(
        log_probs, lengths, beam_size, pre_beam, blank_id, penalty,
        ngram_scorer, ngram_weight,
    )
    state = jax.lax.fori_loop(0, t, step, state)
    return timesync_best(state)


@partial(
    jax.jit,
    static_argnames=(
        "beam_size", "pre_beam", "blank_id", "penalty",
        "ngram_scorer", "ngram_weight",
    ),
)
def ctc_timesync_chunk(
    log_probs: jnp.ndarray,  # (B, Tc, V) CTC log-softmax of this chunk
    valid_lengths: jnp.ndarray,  # (B,) valid frames within the chunk
    state,  # from timesync_init_state / a previous chunk
    beam_size: int = 10,
    pre_beam: int = 10,
    blank_id: int = 0,
    penalty: float = 0.0,
    ngram_scorer: Optional[Callable] = None,
    ngram_weight: float = 0.0,
):
    """Advance the search over one chunk of frames; chainable — the final
    state equals one pass over the concatenated chunks. Read partial
    hypotheses at any point with ``timesync_best(state)``."""
    step = _make_step(
        log_probs, valid_lengths, beam_size, pre_beam, blank_id, penalty,
        ngram_scorer, ngram_weight,
    )
    return jax.lax.fori_loop(0, log_probs.shape[1], step, state)


def _make_step(log_probs, lengths, beam_size, pre_beam, blank_id, penalty,
               ngram_scorer, ngram_weight):
    b, _, v = log_probs.shape
    k = beam_size
    p = min(pre_beam, v - 1)
    n = k * (p + 1)  # stay + extensions per beam

    def step(ti, state):
        tokens, tok_len, log_pb, log_pnb, fusion, h1, h2, last = state
        max_len = tokens.shape[-1]
        lp = log_probs[:, ti]  # (B, V)
        active = (ti < lengths)[:, None]  # (B, 1)

        # ---- stay candidates (one per beam): prefix unchanged --------------
        stay_pb = _logaddexp(log_pb, log_pnb) + lp[:, blank_id][:, None]
        rep = jnp.take_along_axis(lp, jnp.clip(last, 0, v - 1), axis=-1)
        stay_pnb = jnp.where(last >= 0, log_pnb + rep, NEG_INF)

        # ---- extension candidates: top-P tokens of this frame --------------
        top_lp, top_ids = jax.lax.top_k(
            jnp.where(jnp.arange(v)[None] == blank_id, NEG_INF, lp), p
        )  # (B, P)
        cand = top_ids[:, None, :]  # (B, 1, P) broadcast over beams
        is_rep = cand == last[:, :, None]  # extending with the last token
        # repeat token must cross a blank; different token takes pb+pnb
        base = jnp.where(is_rep, log_pb[:, :, None],
                         _logaddexp(log_pb, log_pnb)[:, :, None])
        ext_pnb = base + top_lp[:, None, :]  # (B, K, P)
        full = tok_len >= max_len  # cannot grow further
        ext_pnb = jnp.where(full[:, :, None], NEG_INF, ext_pnb)

        ext_fusion = jnp.broadcast_to(fusion[:, :, None], (b, k, p)) + penalty
        if ngram_scorer is not None and ngram_weight != 0.0:
            flat_tok = jnp.broadcast_to(
                tokens[:, :, None, :], (b, k, p, max_len)
            ).reshape(b * k * p, max_len)
            flat_len = jnp.broadcast_to(
                tok_len[:, :, None], (b, k, p)
            ).reshape(-1)
            flat_cand = jnp.broadcast_to(cand, (b, k, p)).reshape(-1)
            ng = ngram_scorer(flat_tok, flat_len, flat_cand).reshape(b, k, p)
            ext_fusion = ext_fusion + ngram_weight * ng

        ext_h1 = h1[:, :, None] * _H1 + cand.astype(jnp.uint32) + jnp.uint32(1)
        ext_h2 = h2[:, :, None] * _H2 + cand.astype(jnp.uint32) + jnp.uint32(1)

        # ---- assemble the N = K*(P+1) candidate pool -----------------------
        def cat(stay, ext):  # (B,K) + (B,K,P) -> (B,N)
            return jnp.concatenate([stay, ext.reshape(b, -1)], axis=1)

        c_pb = cat(stay_pb, jnp.full((b, k, p), NEG_INF))
        c_pnb = cat(stay_pnb, ext_pnb)
        c_fus = cat(fusion, ext_fusion)
        c_h1 = cat(h1, ext_h1)
        c_h2 = cat(h2, ext_h2)
        c_last = cat(last, jnp.broadcast_to(cand, (b, k, p)))
        c_len = cat(
            tok_len,
            jnp.broadcast_to(
                jnp.minimum(tok_len + 1, max_len)[:, :, None], (b, k, p)
            ),
        )
        c_tok = jnp.concatenate(
            [
                tokens,
                jnp.where(
                    (jnp.arange(max_len)[None, None, None, :]
                     == tok_len[:, :, None, None]),
                    cand[..., None],
                    tokens[:, :, None, :],
                ).reshape(b, -1, max_len),
            ],
            axis=1,
        )  # (B, N, Lmax)

        # ---- merge identical prefixes (sort by hash + segment logsumexp) ---
        order = jnp.argsort(c_h1, axis=1)

        def g(x, o=order):
            return _gather_beams(x, o)

        s_h1, s_h2 = g(c_h1), g(c_h2)
        s_pb, s_pnb, s_fus, s_last, s_len = g(c_pb), g(c_pnb), g(c_fus), g(c_last), g(c_len)
        s_tok = g(c_tok)
        same = (s_h1 == jnp.roll(s_h1, 1, axis=1)) & (
            s_h2 == jnp.roll(s_h2, 1, axis=1)
        )
        same = same.at[:, 0].set(False)
        seg = jnp.cumsum(~same, axis=1) - 1  # (B, N) segment ids, 0-based

        def seg_lse(x):  # per-utterance segment logsumexp into N slots
            def one(xr, sr):
                m = jax.ops.segment_max(xr, sr, num_segments=n)
                m = jnp.maximum(m, NEG_INF)
                s = jax.ops.segment_sum(jnp.exp(xr - m[sr]), sr, num_segments=n)
                return jnp.where(s > 0, m + jnp.log(s), NEG_INF)
            return jax.vmap(one)(x, seg)

        m_pb = seg_lse(s_pb)  # (B, N) indexed by segment id
        m_pnb = seg_lse(s_pnb)

        # representative = first row of each segment (holds tokens/fusion/...)
        def seg_first(sr, idx):
            return jax.ops.segment_min(idx, sr, num_segments=n)
        firsts = jax.vmap(seg_first)(seg, jnp.broadcast_to(jnp.arange(n)[None], (b, n)))
        num_segs = seg[:, -1] + 1
        seg_valid = jnp.arange(n)[None] < num_segs[:, None]
        firsts = jnp.where(seg_valid, firsts, 0)

        r_fus, r_last, r_len = (
            _gather_beams(s_fus, firsts),
            _gather_beams(s_last, firsts),
            _gather_beams(s_len, firsts),
        )
        r_tok = _gather_beams(s_tok, firsts)
        r_h1, r_h2 = _gather_beams(s_h1, firsts), _gather_beams(s_h2, firsts)

        score = _logaddexp(m_pb, m_pnb) + r_fus
        score = jnp.where(seg_valid, score, NEG_INF)

        # ---- prune to K ----------------------------------------------------
        _, keep = jax.lax.top_k(score, k)  # (B, K)
        n_tok = _gather_beams(r_tok, keep)
        n_len = _gather_beams(r_len, keep)
        n_pb = _gather_beams(m_pb, keep)
        n_pnb = _gather_beams(m_pnb, keep)
        n_fus = _gather_beams(r_fus, keep)
        n_h1, n_h2 = _gather_beams(r_h1, keep), _gather_beams(r_h2, keep)
        n_last = _gather_beams(r_last, keep)

        # frames beyond the utterance leave the state untouched
        def sel(new, old):
            a = active.reshape((b,) + (1,) * (new.ndim - 1))
            return jnp.where(a, new, old)

        return (
            sel(n_tok, tokens), sel(n_len, tok_len), sel(n_pb, log_pb),
            sel(n_pnb, log_pnb), sel(n_fus, fusion), sel(n_h1, h1),
            sel(n_h2, h2), sel(n_last, last),
        )

    return step
