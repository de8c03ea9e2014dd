"""Transducer beam search: jit, shapes, and beam-at-least-greedy property."""

import numpy as np
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.decode.transducer_beam import transducer_beam_search
from tailored_avsr_tpu.ops.rnnt import (
    JointNetwork,
    PredictionNetwork,
    transducer_greedy_decode,
)

V, D, H = 7, 12, 16


def make_nets(key):
    joint = JointNetwork(vocab_size=V, joint_dim=8)
    pn = PredictionNetwork(vocab_size=V, embed_dim=8, hidden_dim=H, dropout_rate=0.0)
    labels = jnp.array([[1, 2, -1]])
    pv = pn.init(key, labels)
    jp = joint.init(key, jnp.zeros((1, 1, 1, D)), jnp.zeros((1, 1, 1, H)))

    def pred_apply(state, label):
        return pn.apply(pv, state, label, method="step")

    def joint_apply(enc_t, g):
        return joint.apply(jp, enc_t[:, None, None], g[:, None, None]).reshape(
            enc_t.shape[0], -1
        )

    return pn, pv, pred_apply, joint_apply, jp, joint


def score_alignment(joint_apply, pred_apply, pn, pv, enc_row, tokens):
    """Exact log-prob of the greedy alignment path (blank after each frame's
    emissions) for comparison."""
    # not needed for the property test; kept minimal
    return None


def test_transducer_beam_jit_and_shapes():
    key = jax.random.PRNGKey(0)
    pn, pv, pred_apply, joint_apply, _, _ = make_nets(key)
    enc = jax.random.normal(key, (2, 6, D))
    elens = jnp.array([6, 4])
    k = 4
    init_state = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, 1, axis=0), pn.apply(pv, 2 * k, method="initial_state")
    )
    f = jax.jit(
        lambda e, el: transducer_beam_search(
            e, el, pred_apply, joint_apply, init_state,
            beam_size=k, max_symbols=8,
        )
    )
    res = f(enc, elens)
    assert res.tokens.shape == (2, k, 8)
    assert bool(jnp.all(jnp.isfinite(res.scores[:, 0])))
    # scores sorted descending
    assert bool(jnp.all(res.scores[:, 0] >= res.scores[:, -1]))


def test_beam_contains_greedy_or_better():
    """The 1-best beam score must be >= the score of the greedy path."""
    key = jax.random.PRNGKey(1)
    pn, pv, pred_apply, joint_apply, _, _ = make_nets(key)
    b, t = 2, 5
    enc = jax.random.normal(key, (b, t, D))
    elens = jnp.array([5, 5])
    init1 = pn.apply(pv, b, method="initial_state")
    g_toks, g_counts = transducer_greedy_decode(
        enc, elens, pred_apply, joint_apply, init1, max_symbols_per_frame=2
    )

    # exact score of the greedy output sequence under ALSD-style accumulation:
    # replay greedy and sum its chosen logps
    max_symbols = 10

    def greedy_score(row):
        """Score of the pure-greedy alignment (argmax each step, symbol cap)."""
        state = pn.apply(pv, 1, method="initial_state")
        last = jnp.full((1,), -1, jnp.int32)
        score = 0.0
        ti, emitted = 0, 0
        while ti < t:
            state2, g = pred_apply(state, last)
            logp = jax.nn.log_softmax(
                joint_apply(enc[row][ti][None], g).astype(jnp.float32), -1
            )[0]
            am = int(jnp.argmax(logp))
            if am != 0 and emitted < max_symbols:
                score += float(logp[am])
                last = jnp.array([am], jnp.int32)
                state = state2
                emitted += 1
            else:
                score += float(logp[0])
                ti += 1
        return score

    k = 4
    init_state = pn.apply(pv, b * k, method="initial_state")
    res = transducer_beam_search(
        enc, elens, pred_apply, joint_apply, init_state,
        beam_size=k, max_symbols=10,
    )
    for row in range(b):
        gs = greedy_score(row)
        assert float(res.scores[row, 0]) >= gs - 1e-3, (row, gs, res.scores[row])
