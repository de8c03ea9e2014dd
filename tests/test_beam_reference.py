"""Property test: the jitted tensorized joint CTC/attention beam search
matches an INDEPENDENT slow Python reference (own CTC prefix DP in numpy,
per-hypothesis Python loop) on random tiny models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tailored_avsr_tpu.decode.beam_search import BeamSearchConfig, beam_search

V, SOS = 7, 6  # eos == sos == V-1, blank == 0


def ctc_prefix_logp(logp, y):
    """Graves prefix probability: log P(the T-frame collapse BEGINS with y).

    Independent numpy DP: gamma(y) = sum over t of the mass where y's last
    symbol is FIRST emitted at frame t (continuations of later frames sum to
    probability 1, so they contribute no factor). y must be non-empty.
    """
    T, L = logp.shape[0], len(y)
    assert L >= 1
    NEG = -1e30
    an = np.full(L + 1, NEG)  # collapse == y[:l], last frame emitted y[l-1]
    ab = np.full(L + 1, NEG)  # collapse == y[:l], last frame blank
    ab[0] = 0.0  # before any frame
    gamma = NEG
    for t in range(T):
        an2, ab2 = np.full(L + 1, NEG), np.full(L + 1, NEG)
        for l in range(L + 1):
            ab2[l] = np.logaddexp(ab[l], an[l]) + logp[t, 0]
            if l > 0:
                stay = an[l] + logp[t, y[l - 1]]  # repeat emission
                from_prev = ab[l - 1] + logp[t, y[l - 1]]
                if l == 1 or y[l - 1] != y[l - 2]:
                    from_prev = np.logaddexp(
                        from_prev, an[l - 1] + logp[t, y[l - 1]]
                    )
                an2[l] = np.logaddexp(stay, from_prev)
                if l == L:  # y first completed exactly at frame t
                    gamma = np.logaddexp(gamma, from_prev)
        an, ab = an2, ab2
    return gamma


def python_reference_beam(att_fn, ctc_logp, enc_len, cfg, lmax):
    """Slow reference: espnet-style label-sync joint beam with pre-beam CTC
    partial scoring, eos gating, finished-hypothesis top-k merge."""
    k = cfg.beam_size
    p = min(V, max(1, int(cfg.pre_beam_ratio * k)))
    att_w = 1.0 - cfg.ctc_weight
    maxlen = enc_len if cfg.maxlenratio == 0.0 else int(np.floor(cfg.maxlenratio * enc_len))
    maxlen = max(1, min(maxlen, lmax))  # the search runs at most lmax steps
    minlen = int(np.floor(cfg.minlenratio * enc_len))
    logp = np.asarray(ctc_logp[:enc_len])
    alive = [((SOS,), 0.0)]
    finished = []  # (score, tokens-with-eos, emitted_len)
    for i in range(lmax):
        pos = i + 1
        cands = []
        for tokens, score in alive:
            ys = np.full((1, lmax + 2), SOS, np.int32)
            ys[0, : len(tokens)] = tokens
            att = np.asarray(att_fn(jnp.asarray(ys), jnp.asarray(pos)))[0]
            # selection uses the unweighted posterior when att_w == 0
            sel_w = att_w if att_w > 0 else 1.0
            step = sel_w * att + cfg.penalty
            if i < minlen:
                step[SOS] = -1e10  # block eos
            if i >= maxlen - 1:
                step = np.where(np.arange(V) == SOS, step, -1e10)
            step[0] += -1e10  # blank never emitted
            top = np.argsort(-step)[:p]
            base = list(tokens[1:])
            base_ctc = ctc_prefix_logp(logp, base) if base else 0.0
            for v in top:
                s = score + step[v] - (att[v] if att_w == 0 else 0.0)
                if cfg.ctc_weight > 0:
                    if v == SOS:  # eos: full-sequence CTC probability
                        new_ctc = ctc_full_logp(logp, list(tokens[1:]))
                    else:
                        new_ctc = ctc_prefix_logp(logp, list(tokens[1:]) + [int(v)])
                    s += cfg.ctc_weight * (new_ctc - base_ctc)
                s = max(s, -1e10)
                cands.append((tokens + (int(v),), s))
        new_finished = [
            (s, t, i) for (t, s) in cands if t[-1] == SOS
        ]
        finished = sorted(finished + new_finished, key=lambda x: -x[0])[:k]
        alive = sorted(
            [(t, s) for (t, s) in cands if t[-1] != SOS], key=lambda x: -x[1]
        )[:k]
        if not alive:
            break
    best = sorted(finished, key=lambda x: -x[0])[: cfg.nbest]
    return [(list(t), s, l) for (s, t, l) in best]


def ctc_full_logp(logp, y):
    """log P_ctc(y as the COMPLETE output) — standard CTC forward."""
    T, L = logp.shape[0], len(y)
    NEG = -1e30
    ext = [0]
    for c in y:
        ext += [c, 0]
    S = len(ext)
    a = np.full(S, NEG)
    a[0] = logp[0, 0]
    if S > 1:
        a[1] = logp[0, ext[1]]
    for t in range(1, T):
        a2 = np.full(S, NEG)
        for s in range(S):
            val = a[s]
            if s > 0:
                val = np.logaddexp(val, a[s - 1])
            if s > 1 and ext[s] != 0 and ext[s] != ext[s - 2]:
                val = np.logaddexp(val, a[s - 2])
            a2[s] = val + logp[t, ext[s]]
        a = a2
    return np.logaddexp(a[S - 1], a[S - 2] if S > 1 else NEG)


@pytest.mark.parametrize("cfg", [
    BeamSearchConfig(beam_size=3, ctc_weight=0.4, penalty=0.1, nbest=3),
    BeamSearchConfig(beam_size=4, ctc_weight=0.0, nbest=2),
    BeamSearchConfig(beam_size=3, ctc_weight=0.3, minlenratio=0.3,
                     maxlenratio=0.8, nbest=3),
    BeamSearchConfig(beam_size=3, ctc_weight=1.0, nbest=2),  # pure CTC
    BeamSearchConfig(beam_size=3, ctc_weight=0.4, maxlenratio=2.0,
                     nbest=2),  # maxlen must clamp to the step budget
])
def test_jitted_beam_matches_python_reference(cfg):
    key = jax.random.PRNGKey(int(cfg.beam_size * 100 + cfg.ctc_weight * 10))
    B, T = 2, 6
    ctc_logp = jax.nn.log_softmax(
        jax.random.normal(key, (B, T, V)) * 1.5, axis=-1
    )
    enc_lens = jnp.array([6, 5])
    # a fixed random "decoder": logits depend on (prefix tokens, position)
    W = jax.random.normal(jax.random.fold_in(key, 1), (V, V)) * 1.2
    U = jax.random.normal(jax.random.fold_in(key, 2), (8, V))

    def att_fn(ys, pos):
        tok = jnp.take_along_axis(
            ys, jnp.clip(pos - 1, 0, ys.shape[1] - 1)[None, None]
            .repeat(ys.shape[0], 0), axis=1,
        ).squeeze(1)
        logits = W[tok] + U[jnp.minimum(pos, 7)]
        return jax.nn.log_softmax(logits, axis=-1)

    res = beam_search(att_fn, ctc_logp, enc_lens, SOS, SOS, cfg)
    for b in range(B):
        def att_b(ys, pos, b=b):
            return att_fn(ys, pos)  # position-dependent only -> same per row

        want = python_reference_beam(
            att_b, np.asarray(ctc_logp[b]), int(enc_lens[b]), cfg, T
        )
        got = []
        for j in range(res.tokens.shape[1]):
            L = int(res.lengths[b, j])
            toks = [int(x) for x in np.asarray(res.tokens[b, j, : L + 2])]
            got.append((toks, float(res.scores[b, j]), L))
        for (wt, ws, wl), (gt, gs, gl) in zip(want, got):
            assert wl == gl, (want, got)
            assert wt == gt[: len(wt)], (want, got)
            np.testing.assert_allclose(gs, ws, rtol=1e-4, atol=1e-4)
