"""Tensorized CTC prefix scorer for joint CTC/attention beam search.

TPU-native rewrite of espnet's ``CTCPrefixScorer``/``CTCPrefixScoreTH``
(imported by /root/reference/src/inference/avsr_inference.py:33-41): the
label-synchronous CTC prefix DP (Watanabe et al., hybrid CTC/attention) is
expressed as one ``lax.scan`` over encoder time, scoring ALL candidate token
extensions of every live hypothesis simultaneously — shapes (N, T, P) with
N = batch*beam hypotheses and P = pre-beam candidates, static throughout.

DP (log domain), for prefix g with last token ``last`` extended by token c:
    phi[t]      = logaddexp(r_b[t], c != last ? r_n[t] : -inf)
    r_n'[t][c]  = logaddexp(r_n'[t-1][c], phi[t-1]) + x[t][c]
    r_b'[t][c]  = logaddexp(r_b'[t-1][c], r_n'[t-1][c]) + x[t][blank]
    psi[c]      = logsumexp_t(phi[t-1] + x[t][c])          (total prefix score)
    psi[eos]    = logaddexp(r_n[T-1], r_b[T-1])            (finish score)

Frames beyond the encoder length are neutralized by forcing blank log-prob 0 /
others -inf at input prep, so r[T-1] equals r[len-1].
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e10


class CTCPrefixState(NamedTuple):
    r: jnp.ndarray  # (N, T, 2)  [r_n, r_b] of the current prefix
    score: jnp.ndarray  # (N,)    total CTC prefix score psi of current prefix
    last: jnp.ndarray  # (N,)     last emitted token id (-1 for empty prefix)
    length: jnp.ndarray  # (N,)   number of emitted tokens


def neutralize_padding(logp: jnp.ndarray, lengths: jnp.ndarray, blank_id: int = 0):
    """Force blank w.p. 1 on frames >= length so the DP stalls there."""
    t = logp.shape[1]
    pad = jnp.arange(t)[None, :] >= lengths[:, None]  # (B, T)
    neutral = jnp.full(logp.shape[-1], NEG_INF).at[blank_id].set(0.0)
    return jnp.where(pad[..., None], neutral[None, None, :], logp)


def ctc_prefix_init_state(logp: jnp.ndarray, blank_id: int = 0) -> CTCPrefixState:
    """Initial state for the empty prefix. logp: (N, T, V) padded-neutralized."""
    n, t, _ = logp.shape
    r_b = jnp.cumsum(logp[:, :, blank_id], axis=1)  # (N, T)
    r_n = jnp.full((n, t), NEG_INF)
    r = jnp.stack([r_n, r_b], axis=-1)
    return CTCPrefixState(
        r=r,
        score=jnp.zeros((n,)),
        last=jnp.full((n,), -1, jnp.int32),
        length=jnp.zeros((n,), jnp.int32),
    )


def ctc_prefix_score_step(
    logp: jnp.ndarray,  # (N, T, V) neutralized log-probs
    state: CTCPrefixState,
    cand_ids: jnp.ndarray,  # (N, P) candidate extensions
    eos_id: int,
    blank_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score every candidate extension.

    Returns (psi (N, P) total prefix scores, r_new (N, T, 2, P) per-candidate
    DP state to be gathered for the chosen extensions).
    """
    n, t, v = logp.shape
    p = cand_ids.shape[1]
    xc = jnp.take_along_axis(logp, cand_ids[:, None, :].repeat(t, 1), axis=2)  # (N,T,P)
    x_blank = logp[:, :, blank_id]  # (N, T)

    r_n_prev, r_b_prev = state.r[..., 0], state.r[..., 1]  # (N, T)
    same_as_last = cand_ids == state.last[:, None]  # (N, P)
    # phi[t][c] = logaddexp(r_b[t], repeat? -inf : r_n[t])
    phi = jnp.logaddexp(
        r_b_prev[:, :, None],
        jnp.where(same_as_last[:, None, :], NEG_INF, r_n_prev[:, :, None]),
    )  # (N, T, P)
    # phi shifted: phi[-1] = 0 for the empty prefix else -inf
    empty = (state.length == 0)[:, None]  # (N, 1)
    phi_prev0 = jnp.where(empty, 0.0, NEG_INF)  # (N, P) at t = -1

    phi_shifted = jnp.concatenate(
        [jnp.broadcast_to(phi_prev0, (n, p))[None], phi.transpose(1, 0, 2)[:-1]], axis=0
    )  # (T, N, P): phi[t-1]
    xs = (xc.transpose(1, 0, 2), x_blank.transpose(1, 0), phi_shifted)

    def scan_step(carry, inputs):
        r_n_tm1, r_b_tm1 = carry
        xc_t, xb_t, phi_tm1 = inputs
        # blank at t extends anything that was complete at t-1
        r_b_t = jnp.logaddexp(r_b_tm1, r_n_tm1) + xb_t[:, None]
        r_n_t = jnp.logaddexp(r_n_tm1, phi_tm1) + xc_t
        return (r_n_t, r_b_t), (r_n_t, r_b_t, phi_tm1 + xc_t)

    init = (jnp.full((n, p), NEG_INF), jnp.full((n, p), NEG_INF))
    _, (r_n_all, r_b_all, psi_terms) = jax.lax.scan(scan_step, init, xs)
    psi = jax.nn.logsumexp(psi_terms, axis=0)  # (N, P)

    # eos candidates score = prob of the prefix as a complete output
    prefix_final = jnp.logaddexp(r_n_prev[:, -1], r_b_prev[:, -1])  # (N,)
    psi = jnp.where(cand_ids == eos_id, prefix_final[:, None], psi)
    # blank extensions are invalid: keep them impossibly low
    psi = jnp.where(cand_ids == blank_id, NEG_INF, psi)

    r_new = jnp.stack([r_n_all, r_b_all], axis=2).transpose(1, 0, 2, 3)  # (N,T,2,P)
    return psi, r_new


def ctc_prefix_select(
    state: CTCPrefixState,
    psi: jnp.ndarray,  # (N, P)
    r_new: jnp.ndarray,  # (N, T, 2, P)
    cand_ids: jnp.ndarray,  # (N, P)
    src_hyp: jnp.ndarray,  # (N,) index of the source hypothesis for each new hyp
    sel_cand: jnp.ndarray,  # (N,) index into P of the chosen candidate
) -> CTCPrefixState:
    """Gather the DP state for the chosen (source hypothesis, candidate) pairs."""
    r_src = r_new[src_hyp]  # (N, T, 2, P)
    psi_src = psi[src_hyp]
    cand_src = cand_ids[src_hyp]
    n = src_hyp.shape[0]
    idx = jnp.arange(n)
    r_sel = r_src[idx, :, :, sel_cand]  # (N, T, 2)
    score_sel = psi_src[idx, sel_cand]
    tok_sel = cand_src[idx, sel_cand]
    return CTCPrefixState(
        r=r_sel,
        score=score_sel,
        last=tok_sel,
        length=state.length[src_hyp] + 1,
    )
