"""N-gram scorer tests: ARPA parsing, backoff resolution, jittable scoring,
beam-search fusion."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.decode.ngram import NgramScorer, parse_arpa

ARPA = """\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-0.60206\tA\t-0.30103
-0.60206\tB\t-0.30103
-0.90309\tC\t0.0
-1.0\t<unk>

\\2-grams:
-0.30103\tA B
-0.60206\tB A
-0.30103\tB C

\\end\\
"""


def write_arpa(tmp_path):
    p = str(tmp_path / "lm.arpa")
    with open(p, "w") as f:
        f.write(ARPA)
    return p


def test_parse_arpa(tmp_path):
    tabs = parse_arpa(write_arpa(tmp_path))
    assert ("A",) in tabs[1] and ("A", "B") in tabs[2]
    lp, bo = tabs[1][("A",)]
    np.testing.assert_allclose(lp, -0.60206 * math.log(10), rtol=1e-6)
    np.testing.assert_allclose(bo, -0.30103 * math.log(10), rtol=1e-6)


def test_scorer_backoff_and_direct(tmp_path):
    tokens = ["<blank>", "A", "B", "C"]
    sc = NgramScorer(write_arpa(tmp_path), tokens, order=2)
    # context A: P(B|A) exists directly
    ys = jnp.array([[1, 0, 0]])  # last token A at pos 0... build buffer [A]
    logp = sc.score_step(jnp.array([[1, 0, 0]]), 1)  # context = ys[:, 0] = A
    np.testing.assert_allclose(
        float(logp[0, 2]), -0.30103 * math.log(10), rtol=1e-5
    )
    # P(C|A) backs off: bo(A) + P(C)
    want = (-0.30103 + -0.90309) * math.log(10)
    np.testing.assert_allclose(float(logp[0, 3]), want, rtol=1e-5)


def test_scorer_jit_and_beam_fusion(tmp_path):
    tokens = ["<blank>", "A", "B", "C", "<sos/eos>"]
    sc = NgramScorer(write_arpa(tmp_path), tokens, order=2)
    f = jax.jit(lambda ys, pos: sc.score_step(ys, pos))
    out = f(jnp.array([[4, 1, 0, 0], [4, 2, 0, 0]]), jnp.asarray(2))
    assert out.shape == (2, 5)
    # fuse into the beam search as lm_score_fn
    from tailored_avsr_tpu.decode import BeamSearchConfig, beam_search

    v, t = 5, 6
    ctc_logp = jnp.log(jnp.full((1, t, v), 1.0 / v))
    def neutral_att(ys, pos):
        return jnp.zeros((ys.shape[0], v))
    cfg = BeamSearchConfig(beam_size=2, ctc_weight=0.0, lm_weight=1.0)
    res = beam_search(
        neutral_att, ctc_logp, jnp.array([t]), 4, 4, cfg, lm_score_fn=sc.score_step
    )
    assert np.isfinite(float(res.scores[0, 0]))


def test_score_candidates_matches_score_step(tmp_path):
    """The per-row candidate API (timesync fusion) agrees with score_step."""
    tokens = ["<blank>", "A", "B", "C"]
    sc = NgramScorer(write_arpa(tmp_path), tokens, order=2)
    buf = jnp.array([[1, 2, 0], [2, 0, 0], [0, 0, 0]])  # [A,B], [B], []
    lens = jnp.array([2, 1, 0])
    cand = jnp.array([1, 3, 2])  # A|B after AB; C after B; B given empty
    got = sc.score_candidates(buf, lens, cand)
    for i in range(3):
        want = sc.score_step(buf[i][None], int(lens[i]))[0, int(cand[i])]
        np.testing.assert_allclose(float(got[i]), float(want), rtol=1e-6)


def test_part_scorer_gather_matches_score_step(tmp_path):
    """score_step_candidates == score_step gathered at the candidate ids."""
    tokens = ["<blank>", "A", "B", "C", "<sos/eos>"]
    sc = NgramScorer(write_arpa(tmp_path), tokens, order=2)
    ys = jnp.array([[4, 1, 2, 0], [4, 2, 0, 0]])
    cand = jnp.array([[1, 3, 0], [2, 2, 4]])
    got = sc.score_step_candidates(ys, 3, cand)
    full = sc.score_step(ys, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.take_along_axis(np.asarray(full), np.asarray(cand), 1)
    )


def test_part_scorer_beam_matches_full_when_prebeam_covers_vocab(tmp_path):
    """With pre_beam >= V the candidate sets are identical in both modes, so
    the part scorer (espnet NgramPartScorer semantics — scores only pre-beam
    candidates after selection) must return the exact n-best of the full
    scorer (ref avsr_inference.py:167-178)."""
    from tailored_avsr_tpu.decode import BeamSearchConfig, beam_search

    tokens = ["<blank>", "A", "B", "C", "<sos/eos>"]
    sc = NgramScorer(write_arpa(tmp_path), tokens, order=2)
    v, t, b = 5, 6, 2
    key = jax.random.PRNGKey(1)
    ctc_logp = jax.nn.log_softmax(jax.random.normal(key, (b, t, v)), -1)
    att_tab = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(2), (v, v)), -1
    )

    def att(ys, pos):  # context-dependent but cheap deterministic scorer
        last = jnp.take_along_axis(
            ys, jnp.full((ys.shape[0], 1), pos - 1), axis=1
        ).squeeze(1)
        return att_tab[last]

    lens = jnp.array([t, t - 2])
    # beam 4, ratio 1.5 -> pre_beam 6 >= v: selection covers the whole vocab
    full = beam_search(
        att, ctc_logp, lens, 4, 4,
        BeamSearchConfig(beam_size=4, ctc_weight=0.3, lm_weight=0.7, nbest=3),
        lm_score_fn=sc.score_step,
    )
    part = beam_search(
        att, ctc_logp, lens, 4, 4,
        BeamSearchConfig(beam_size=4, ctc_weight=0.3, ngram_weight=0.7,
                         nbest=3),
        ngram_part_fn=sc.score_step_candidates,
    )
    np.testing.assert_array_equal(np.asarray(full.tokens), np.asarray(part.tokens))
    np.testing.assert_array_equal(np.asarray(full.lengths), np.asarray(part.lengths))
    np.testing.assert_allclose(
        np.asarray(full.scores), np.asarray(part.scores), atol=1e-5
    )


def test_timesync_ngram_fusion_changes_ranking(tmp_path):
    """In-loop n-gram fusion in the time-synchronous search shifts scores by
    ngram_weight * sum log P(token | context)."""
    from tailored_avsr_tpu.decode.ctc_timesync import ctc_timesync_beam_search

    tokens = ["<blank>", "A", "B", "C"]
    sc = NgramScorer(write_arpa(tmp_path), tokens, order=2)
    key = jax.random.PRNGKey(0)
    lp = jax.nn.log_softmax(jax.random.normal(key, (1, 5, 4)) * 1.5, -1)
    lens = jnp.array([5])
    t0, l0, s0, c0 = ctc_timesync_beam_search(
        lp, lens, beam_size=4, pre_beam=3, max_len=6)
    t1, l1, s1, c1 = ctc_timesync_beam_search(
        lp, lens, beam_size=4, pre_beam=3, max_len=6,
        ngram_scorer=sc.score_candidates, ngram_weight=0.7)
    # find a shared hypothesis and check its fusion term exactly
    for ki in range(4):
        seq = [int(x) for x in np.asarray(t1[0, ki, : int(l1[0, ki])])]
        if not seq:
            continue
        # expected ngram total under the scorer
        tot = 0.0
        for j, c in enumerate(seq):
            buf = jnp.zeros((1, 6), jnp.int32)
            if j:
                buf = buf.at[0, :j].set(jnp.asarray(seq[:j]))
            tot += float(sc.score_candidates(buf, jnp.array([j]),
                                             jnp.array([c]))[0])
        np.testing.assert_allclose(
            float(s1[0, ki] - c1[0, ki]), 0.7 * tot, atol=1e-4)
        break
    else:
        raise AssertionError("no non-empty hypothesis found")
