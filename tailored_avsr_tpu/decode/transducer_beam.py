"""Transducer beam search (alignment-length synchronous, jittable).

Capability parity with espnet's ``BeamSearchTransducer`` (registered by the
reference at /root/reference/src/tasks/avsr.py:64; the transducer path is
optional — no shipped config enables it). TPU-native re-design as ALSD
(Saon et al., 2020): every loop step extends each hypothesis' alignment by
exactly one symbol — blank (advance one encoder frame) or a token (stay on the
frame, grow the label prefix) — so the whole search is a fixed
``T + max_symbols`` iteration ``lax.fori_loop`` over (B, K) tensorized beams.
Hypotheses that consume all frames migrate to a finished buffer via top-k
merge. Candidates with equal (label-prefix, encoder-frame) are merged by
log-sum-exp BEFORE the beam top-k (lowest-index candidate becomes canonical,
duplicates retired) — the tensorized analogue of espnet's prefix-alpha
recombination. Because every path to the same (prefix, frame) pair has the
same alignment length u + t, all of its paths meet at the same loop step, so
the merge is exact: with a beam wide enough to hold every reachable pair the
search returns the true sum-over-alignments sequence probabilities
(property-tested against exhaustive enumeration in
tests/test_transducer_beam.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e10


class TransducerBeamResult(NamedTuple):
    tokens: jnp.ndarray  # (B, K, Lmax)
    lengths: jnp.ndarray  # (B, K)
    scores: jnp.ndarray  # (B, K)


def transducer_beam_search(
    enc: jnp.ndarray,  # (B, T, D)
    enc_lengths: jnp.ndarray,  # (B,)
    pred_apply: Callable,  # (state, label (N,)) -> (state, (N, H))
    joint_apply: Callable,  # (enc_t (N, D), g (N, H)) -> (N, V) logits
    init_state,  # prediction-network state for N = B*K rows
    beam_size: int = 5,
    max_symbols: int = 50,
    blank_id: int = 0,
    prune_tokens: int = 4,  # token expansions considered per hypothesis
    merge_prefixes: bool = True,  # log-sum-exp equal (prefix, frame) candidates
) -> TransducerBeamResult:
    b, t, _ = enc.shape
    k = beam_size
    n = b * k
    lmax = max_symbols
    steps = t + max_symbols

    tokens = jnp.zeros((b, k, lmax), jnp.int32)
    lens = jnp.zeros((b, k), jnp.int32)
    scores = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)
    t_idx = jnp.zeros((b, k), jnp.int32)  # per-hyp encoder frame position
    last = jnp.full((n,), -1, jnp.int32)  # last emitted token (-1 = start)
    fin_tokens = jnp.zeros((b, k, lmax), jnp.int32)
    fin_lens = jnp.zeros((b, k), jnp.int32)
    fin_scores = jnp.full((b, k), NEG_INF)

    # g output cache: recompute per step from the threaded LSTM state
    batch_rows = jnp.repeat(jnp.arange(b), k)  # (N,) utterance of each row

    def step(_, carry):
        (tokens, lens, scores, t_idx, last, state,
         fin_tokens, fin_lens, fin_scores) = carry
        # gather each hypothesis' encoder frame
        tt = jnp.minimum(t_idx.reshape(n), t - 1)
        enc_t = enc[batch_rows, tt]  # (N, D)
        new_state, g = pred_apply(state, last)
        # the prediction state only advances when a token is emitted; keep both
        logits = joint_apply(enc_t, g)  # (N, V)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        alive = (t_idx.reshape(n) < enc_lengths[batch_rows]) & (
            scores.reshape(n) > NEG_INF / 2
        )
        full = lens.reshape(n) >= lmax

        # blank candidate: advance frame
        blank_score = scores.reshape(n) + jnp.where(alive, logp[:, blank_id], NEG_INF)
        # token candidates: top-P non-blank
        tok_logp = logp.at[:, blank_id].set(NEG_INF)
        top_lp, top_id = jax.lax.top_k(tok_logp, prune_tokens)  # (N, P)
        tok_scores = scores.reshape(n)[:, None] + jnp.where(
            (alive & ~full)[:, None], top_lp, NEG_INF
        )  # (N, P)

        # combine per utterance: K*(P+1) candidates
        p1 = prune_tokens + 1
        cand_scores = jnp.concatenate(
            [blank_score[:, None], tok_scores], axis=1
        ).reshape(b, k * p1)

        if merge_prefixes:
            # ---- prefix merging BEFORE top-k: candidates with identical
            # (label prefix, encoder frame) are the same hypothesis — their
            # prediction-network states are functions of the token history —
            # so log-sum-exp their path probabilities into the lowest-index
            # candidate and retire the duplicates. Collisions arise when a
            # blank extension of (y, t) meets a token extension u of (y', t+1)
            # with y = y' + u, or trivially between equal candidates.
            hyp_tokens = tokens.reshape(n, lmax)
            hyp_lens = lens.reshape(n)
            app_pos = jnp.arange(lmax)[None, :] == hyp_lens[:, None]  # (N, L)
            appended = jnp.where(
                app_pos[:, None, :], top_id[:, :, None], hyp_tokens[:, None, :]
            )  # (N, P, L)
            cand_tokens = jnp.concatenate(
                [hyp_tokens[:, None, :], appended], axis=1
            )  # (N, P1, L)
            kind = jnp.arange(p1)
            cand_lens = hyp_lens[:, None] + (kind > 0).astype(jnp.int32)
            cand_frame = t_idx.reshape(n)[:, None] + (kind == 0).astype(jnp.int32)
            c = k * p1
            ct = cand_tokens.reshape(b, c, lmax)
            cl = cand_lens.reshape(b, c)
            cf = cand_frame.reshape(b, c)
            okay = cand_scores > NEG_INF / 2  # (B, C)
            pos_valid = jnp.arange(lmax)[None, None, :] < cl[:, :, None]
            tok_cmp = jnp.where(pos_valid, ct, -1)
            eq = (
                (cl[:, :, None] == cl[:, None, :])
                & (cf[:, :, None] == cf[:, None, :])
                & jnp.all(tok_cmp[:, :, None, :] == tok_cmp[:, None, :, :], axis=-1)
                & okay[:, :, None]
                & okay[:, None, :]
            )  # (B, C, C)
            first_in_group = jnp.argmax(eq, axis=-1)  # lowest j with eq[i, j]
            merged_sc = jax.nn.logsumexp(
                jnp.where(eq, cand_scores[:, None, :], NEG_INF), axis=-1
            )
            is_canonical = first_in_group == jnp.arange(c)[None, :]
            cand_scores = jnp.where(
                okay, jnp.where(is_canonical, merged_sc, NEG_INF), cand_scores
            )

        top_sc, top_ix = jax.lax.top_k(cand_scores, k)  # (B, K)
        src_hyp = top_ix // p1  # (B, K)
        cand_kind = top_ix % p1  # 0 = blank, >=1 token index+1
        g_src = (jnp.arange(b)[:, None] * k + src_hyp).reshape(n)

        is_blank = (cand_kind == 0).reshape(n)
        tok_choice = jnp.take_along_axis(
            top_id[g_src], jnp.maximum(cand_kind.reshape(n, 1) - 1, 0), axis=1
        ).squeeze(1)

        new_tokens = tokens.reshape(n, lmax)[g_src]
        new_lens = lens.reshape(n)[g_src]
        new_t = t_idx.reshape(n)[g_src] + is_blank.astype(jnp.int32)
        emit = ~is_blank
        pos_mask = jnp.arange(lmax)[None, :] == new_lens[:, None]
        new_tokens = jnp.where(
            (emit[:, None] & pos_mask), tok_choice[:, None], new_tokens
        )
        new_lens = new_lens + emit.astype(jnp.int32)
        new_last = jnp.where(emit, tok_choice, last[g_src])
        state_sel = jax.tree_util.tree_map(
            lambda new_leaf, old_leaf: jnp.where(
                emit.reshape((-1,) + (1,) * (new_leaf.ndim - 1)),
                new_leaf[g_src],
                old_leaf[g_src],
            ),
            new_state,
            state,
        )

        # finished: frame pointer hit the utterance length
        done = new_t >= enc_lengths[batch_rows]
        done_scores = jnp.where(done, top_sc.reshape(n), NEG_INF).reshape(b, k)
        merged = jnp.concatenate([fin_scores, done_scores], axis=1)
        best, best_ix = jax.lax.top_k(merged, k)
        from_old = best_ix < k
        bidx = jnp.arange(b)[:, None]
        new_rows = jnp.clip(best_ix - k, 0, k - 1)
        old_rows = jnp.clip(best_ix, 0, k - 1)
        fin_tokens = jnp.where(
            from_old[..., None],
            fin_tokens[bidx, old_rows],
            new_tokens.reshape(b, k, lmax)[bidx, new_rows],
        )
        fin_lens = jnp.where(
            from_old, fin_lens[bidx, old_rows],
            new_lens.reshape(b, k)[bidx, new_rows],
        )
        fin_scores = best
        # finished hyps leave the alive beam (candidates were already
        # prefix-merged before selection, so the survivors are unique)
        alive_scores = jnp.where(done, NEG_INF, top_sc.reshape(n)).reshape(b, k)

        return (
            new_tokens.reshape(b, k, lmax), new_lens.reshape(b, k), alive_scores,
            new_t.reshape(b, k), new_last, state_sel,
            fin_tokens, fin_lens, fin_scores,
        )

    carry = (tokens, lens, scores, t_idx, last, init_state,
             fin_tokens, fin_lens, fin_scores)
    carry = jax.lax.fori_loop(0, steps, step, carry)
    _, _, _, _, _, _, fin_tokens, fin_lens, fin_scores = carry
    return TransducerBeamResult(fin_tokens, fin_lens, fin_scores)
