"""Decoding-engine tests: CTC prefix scorer vs brute-force path enumeration,
tensorized beam search behavior, Mask-CTC iterative decoding."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.decode import (
    BeamSearchConfig,
    beam_search,
    ctc_prefix_init_state,
    ctc_prefix_score_step,
    maskctc_decode,
    ctc_greedy_collapse,
)
from tailored_avsr_tpu.decode.ctc_prefix import (
    ctc_prefix_select,
    neutralize_padding,
    to_time_minor,
)
from tailored_avsr_tpu.decode.maskctc import _collapse_row


def brute_force_prefix_prob(logp, prefix):
    """P(collapsed output has `prefix` as a prefix), enumerating all paths."""
    t, v = logp.shape
    p = np.exp(logp)
    total = 0.0
    for path in itertools.product(range(v), repeat=t):
        prob = np.prod([p[i, c] for i, c in enumerate(path)])
        # collapse: remove repeats then blanks (blank=0)
        col = []
        prev = -1
        for c in path:
            if c != prev and c != 0:
                col.append(c)
            prev = c
        if tuple(col[: len(prefix)]) == tuple(prefix):
            total += prob
    return total


def brute_force_exact_prob(logp, seq):
    t, v = logp.shape
    p = np.exp(logp)
    total = 0.0
    for path in itertools.product(range(v), repeat=t):
        prob = np.prod([p[i, c] for i, c in enumerate(path)])
        col = []
        prev = -1
        for c in path:
            if c != prev and c != 0:
                col.append(c)
            prev = c
        if tuple(col) == tuple(seq):
            total += prob
    return total


def test_ctc_prefix_scorer_matches_brute_force():
    rng = np.random.RandomState(0)
    t, v = 4, 4  # blank=0, tokens 1,2; eos=3
    eos = 3
    raw = rng.randn(1, t, v).astype(np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(raw), -1))
    lens = jnp.array([t])
    neutral = to_time_minor(neutralize_padding(jnp.asarray(logp), lens))
    state = ctc_prefix_init_state(neutral)
    cand = jnp.array([[1, 2, eos]])
    psi, r_new = ctc_prefix_score_step(neutral, state, cand, eos_id=eos)
    # extending the empty prefix: psi[c] = P(output starts with c)
    for j, c in enumerate([1, 2]):
        want = brute_force_prefix_prob(logp[0], [c])
        got = float(np.exp(psi[0, j]))
        np.testing.assert_allclose(got, want, rtol=1e-4), c
    # eos on empty prefix = P(output is empty)
    want_empty = brute_force_exact_prob(logp[0], [])
    np.testing.assert_allclose(float(np.exp(psi[0, 2])), want_empty, rtol=1e-4)

    # now extend prefix [1] by 1, 2, eos
    state1 = ctc_prefix_select(
        state, psi, r_new, cand, jnp.array([0]), jnp.array([0])
    )
    psi2, _ = ctc_prefix_score_step(neutral, state1, cand, eos_id=eos)
    np.testing.assert_allclose(
        float(np.exp(psi2[0, 0])), brute_force_prefix_prob(logp[0], [1, 1]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(np.exp(psi2[0, 1])), brute_force_prefix_prob(logp[0], [1, 2]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(np.exp(psi2[0, 2])), brute_force_exact_prob(logp[0], [1]), rtol=1e-4
    )


def test_ctc_prefix_padding_neutralized():
    rng = np.random.RandomState(1)
    t, v, eos = 6, 4, 3
    raw = rng.randn(1, t, v).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(raw), -1)
    # truncate to 4 frames via padding-neutralization == hard truncation
    neutral = to_time_minor(neutralize_padding(logp, jnp.array([4])))
    state = ctc_prefix_init_state(neutral)
    cand = jnp.array([[1, 2, eos]])
    psi_pad, _ = ctc_prefix_score_step(neutral, state, cand, eos_id=eos)
    short = to_time_minor(neutralize_padding(logp[:, :4], jnp.array([4])))
    psi_short, _ = ctc_prefix_score_step(
        short, ctc_prefix_init_state(short), cand, eos_id=eos
    )
    np.testing.assert_allclose(np.asarray(psi_pad), np.asarray(psi_short), atol=1e-4)


def make_att_fn(preferred, v, bonus=5.0):
    """Attention scorer that rewards following `preferred` token sequence."""
    preferred = jnp.asarray(preferred)

    def att_fn(ys, pos):
        n = ys.shape[0]
        base = jnp.full((n, v), -bonus)
        tgt = preferred[jnp.minimum(pos - 1, preferred.shape[0] - 1)]
        return base.at[:, tgt].set(bonus)

    return att_fn


def test_beam_search_follows_attention():
    v, eos, sos = 6, 5, 5
    t = 8
    # uniform CTC so attention dominates
    ctc_logp = jnp.log(jnp.full((1, t, v), 1.0 / v))
    enc_lens = jnp.array([t])
    pref = [1, 2, 3, eos]
    cfg = BeamSearchConfig(beam_size=3, ctc_weight=0.0, nbest=2)
    res = beam_search(make_att_fn(pref, v), ctc_logp, enc_lens, sos, eos, cfg)
    toks = np.asarray(res.tokens[0, 0])
    assert toks[0] == sos
    np.testing.assert_array_equal(toks[1:4], [1, 2, 3])
    assert int(res.lengths[0, 0]) == 3
    assert float(res.scores[0, 0]) >= float(res.scores[0, 1])


def test_beam_search_joint_ctc_respects_ctc():
    """CTC strongly favors '1 2'; a neutral decoder should yield '1 2'."""
    v, eos, sos = 4, 3, 3
    t = 6
    # build CTC logp peaked on path 1 1 0 2 2 0 -> collapse '1 2'
    path = [1, 1, 0, 2, 2, 0]
    logits = np.full((1, t, v), -4.0, np.float32)
    for i, c in enumerate(path):
        logits[0, i, c] = 4.0
    ctc_logp = jax.nn.log_softmax(jnp.asarray(logits), -1)

    def neutral_att(ys, pos):
        return jnp.zeros((ys.shape[0], v))

    cfg = BeamSearchConfig(beam_size=4, ctc_weight=0.7, nbest=1)
    res = beam_search(neutral_att, ctc_logp, jnp.array([t]), sos, eos, cfg)
    toks = np.asarray(res.tokens[0, 0])
    n = int(res.lengths[0, 0])
    np.testing.assert_array_equal(toks[1 : 1 + n], [1, 2])


def test_beam_search_jit_and_batch():
    v, eos, sos = 6, 5, 5
    t = 8
    ctc_logp = jnp.log(jnp.full((2, t, v), 1.0 / v))
    enc_lens = jnp.array([t, 5])
    pref = [1, 2, 3, eos]
    cfg = BeamSearchConfig(beam_size=3, ctc_weight=0.3)
    f = jax.jit(
        lambda lp, el: beam_search(make_att_fn(pref, v), lp, el, sos, eos, cfg)
    )
    res = f(ctc_logp, enc_lens)
    assert res.tokens.shape == (2, 1, t + 2)
    # second utterance maxlen 5 -> length <= 4
    assert int(res.lengths[1, 0]) <= 5


def test_lm_shallow_fusion_changes_result():
    v, eos, sos = 6, 5, 5
    t = 6
    ctc_logp = jnp.log(jnp.full((1, t, v), 1.0 / v))
    att = make_att_fn([1, eos], v, bonus=1.0)

    def lm_fn(ys, pos):  # LM adores token 2
        n = ys.shape[0]
        return jnp.full((n, v), -3.0).at[:, 2].set(3.0)

    cfg0 = BeamSearchConfig(beam_size=3, ctc_weight=0.0, lm_weight=0.0)
    cfg1 = BeamSearchConfig(beam_size=3, ctc_weight=0.0, lm_weight=5.0)
    r0 = beam_search(att, ctc_logp, jnp.array([t]), sos, eos, cfg0)
    r1 = beam_search(att, ctc_logp, jnp.array([t]), sos, eos, cfg1, lm_score_fn=lm_fn)
    assert int(r0.tokens[0, 0, 1]) == 1
    assert int(r1.tokens[0, 0, 1]) == 2


def test_greedy_collapse():
    ids = np.array([[0, 1, 1, 0, 2, 2, 3, 0]])
    out = ctc_greedy_collapse(ids, np.array([8]))
    assert out == [[1, 2, 3]]
    out = ctc_greedy_collapse(ids, np.array([4]))
    assert out == [[1]]


def test_maskctc_collapse_row():
    probs = jnp.array([0.9, 0.8, 0.95, 0.7, 0.6, 0.99])
    ids = jnp.array([1, 1, 0, 2, 3, 3], jnp.int32)
    toks, tprobs, n = _collapse_row(probs, ids, jnp.asarray(6), 0, 99)
    assert int(n) == 3
    np.testing.assert_array_equal(np.asarray(toks[:3]), [1, 2, 3])
    np.testing.assert_allclose(np.asarray(tprobs[:3]), [0.9, 0.7, 0.99], atol=1e-6)


def test_maskctc_decode_fills_masks():
    v = 5
    t = 6
    # ctc: confident '1', unconfident junk, confident '2'
    logits = np.full((1, t, v), 0.0, np.float32)
    logits[0, 0, 1] = 8.0  # confident 1
    logits[0, 1, 0] = 8.0  # blank
    logits[0, 2, 3] = 0.5  # low-confidence 3
    logits[0, 3, 0] = 8.0
    logits[0, 4, 2] = 8.0  # confident 2
    logits[0, 5, 0] = 8.0
    ctc_logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    mask_token = v

    def mlm_fn(ys, lens):  # MLM always predicts token 4 with high confidence
        return jnp.zeros((ys.shape[0], ys.shape[1], v)).at[:, :, 4].set(9.0)

    res = maskctc_decode(
        ctc_logp, jnp.array([t]), mlm_fn, mask_token, threshold=0.9, num_iterations=2
    )
    assert int(res.lengths[0]) == 3
    toks = np.asarray(res.tokens[0, :3])
    np.testing.assert_array_equal(toks, [1, 4, 2])  # middle mask filled by MLM


def test_maskctc_eos_conditioning_and_small_mask_counts():
    """The MLM is called with a trailing eos inside the valid length (the
    training input distribution), mask_num < K fills one token per round, and
    num_iterations=0 still fills every mask."""
    from tailored_avsr_tpu.decode.maskctc import maskctc_decode

    B, T, V = 1, 6, 8
    eos = V - 1
    # CTC posteriors: tokens [1, 2] confident, [3] low-confidence -> masked
    logp = np.full((B, T, V), -10.0, np.float32)
    for t, (tok, conf) in enumerate([(1, 0.99999), (2, 0.99999), (3, 0.5),
                                     (0, 0.99999), (0, 0.99999), (0, 0.99999)]):
        logp[0, t, tok] = np.log(conf)
    def mlm_fn(ys, lens):
        # predict 5 only if the (training-distribution) trailing eos is
        # visible at position lens-1; otherwise predict 4 — the filled token
        # therefore proves the decode passed [tokens..., eos] with lens + 1
        has_eos = jnp.take_along_axis(ys, (lens - 1)[:, None], axis=1) == eos
        tok = jnp.where(has_eos, 5, 4)  # (B, 1)
        onehot = (
            jnp.arange(V + 1)[None, None, :] == tok[:, :, None]
        )
        return jnp.where(
            jnp.broadcast_to(onehot, (ys.shape[0], ys.shape[1], V + 1)),
            10.0, -10.0,
        )

    res = maskctc_decode(jnp.asarray(logp), jnp.array([T]), mlm_fn,
                         mask_token=V, threshold=0.9, num_iterations=4,
                         eos=eos)
    ids = [int(x) for x in np.asarray(res.tokens[0, : int(res.lengths[0])])]
    assert ids == [1, 2, 5], ids  # 5 <=> the MLM saw the trailing eos
    # num_iterations=0 behaves like a single fill-all round
    res0 = maskctc_decode(jnp.asarray(logp), jnp.array([T]), mlm_fn,
                          mask_token=V, threshold=0.9, num_iterations=0,
                          eos=eos)
    assert V not in [int(x) for x in np.asarray(res0.tokens[0])][:3]
