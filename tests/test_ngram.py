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
