"""RNNT tests: loss vs exhaustive path enumeration, joint/prediction nets,
jittable greedy decode."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.rnnt import (
    JointNetwork,
    PredictionNetwork,
    rnnt_loss,
    transducer_greedy_decode,
)


def brute_force_rnnt_nll(logp, labels):
    """-log P(labels | x) by recursing over the (t, u) lattice."""
    t_max, u1, v = logp.shape
    u_max = len(labels)
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def alpha(t, u):
        # log prob of consuming t frames' blanks and u labels, ending at (t, u)
        if t == 0 and u == 0:
            return 0.0
        cands = []
        if t > 0:
            cands.append(alpha(t - 1, u) + float(logp[t - 1, u, 0]))  # blank
        if u > 0:
            cands.append(alpha(t, u - 1) + float(logp[t, u - 1, labels[u - 1]]))
        return float(np.logaddexp.reduce(cands)) if cands else -np.inf

    final = alpha(t_max - 1, u_max) + float(logp[t_max - 1, u_max, 0])
    return -final


def test_rnnt_loss_matches_brute_force():
    rng = np.random.RandomState(0)
    b, t, u, v = 2, 4, 2, 5
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    labels = np.array([[1, 2], [3, -1]])
    tlens = np.array([4, 3])
    ulens = np.array([2, 1])
    got = float(
        rnnt_loss(
            jnp.asarray(logits), jnp.asarray(tlens), jnp.asarray(labels), jnp.asarray(ulens)
        )
    )
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    want = (
        brute_force_rnnt_nll(logp[0, :4, :3], [1, 2])
        + brute_force_rnnt_nll(logp[1, :3, :2], [3])
    ) / 2
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_rnnt_loss_grad_finite():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 6, 4, 7).astype(np.float32))
    g = jax.grad(
        lambda l: rnnt_loss(l, jnp.array([6, 5]), jnp.array([[1, 2, 3], [4, 5, -1]]),
                            jnp.array([3, 2]))
    )(logits)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_joint_and_prediction_networks():
    key = jax.random.PRNGKey(0)
    v, d, h = 7, 12, 16
    joint = JointNetwork(vocab_size=v, joint_dim=8)
    enc = jax.random.normal(key, (2, 5, 1, d))
    pred = jax.random.normal(key, (2, 1, 4, h))
    jp = joint.init(key, enc, pred)
    out = joint.apply(jp, enc, pred)
    assert out.shape == (2, 5, 4, v)

    pn = PredictionNetwork(vocab_size=v, embed_dim=8, hidden_dim=h, dropout_rate=0.0)
    labels = jnp.array([[1, 2, -1], [3, 4, 5]])
    pv = pn.init(key, labels)
    g = pn.apply(pv, labels)
    assert g.shape == (2, 4, h)
    # step() after one label == full forward position 1
    state0 = pn.apply(pv, 2, method="initial_state")
    state1, g1 = pn.apply(pv, state0, jnp.array([1, 3]), method="step")
    # full forward: g[:, 1] is after consuming first label... note __call__
    # row 0: labels [1], row 1: [3]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g[:, 1]), atol=1e-5)


def test_transducer_model_via_task_factory():
    """decoder: transducer builds joint+prediction nets; loss/grad finite."""
    import argparse

    from tailored_avsr_tpu.tasks import ASRTask

    cfg = argparse.Namespace(
        task="asr", model="espnet",
        frontend="default", frontend_conf={},
        encoder="branchformer",
        encoder_conf={"output_size": 32, "attention_heads": 4, "linear_units": 48,
                      "cgmlp_linear_units": 48, "cgmlp_conv_kernel": 7,
                      "num_blocks": 1, "input_layer": "conv2d", "dropout_rate": 0.0},
        decoder="transducer",
        decoder_conf={"hidden_size": 32, "embed_size": 32, "num_layers": 1,
                      "dropout_rate": 0.0},
        joint_net_conf={"joint_space_size": 24},
        ctc_conf={}, model_conf={"ctc_weight": 0.3},
    )
    tokens = ["<blank>", "<unk>"] + list("ABCDE") + ["<sos/eos>"]
    model = ASRTask.build_model(cfg, tokens)
    key = jax.random.PRNGKey(0)
    wav = jax.random.normal(key, (2, 6400))
    lens = jnp.array([6400, 3200])
    labels = jnp.array([[2, 3, 4, -1], [5, 6, -1, -1]])
    tlens = jnp.array([3, 2])
    v = model.init({"params": key, "mlm": key}, wav, lens, labels, tlens)
    loss, stats = model.apply(v, wav, lens, labels, tlens)
    assert np.isfinite(float(loss)) and "loss_transducer" in stats
    np.testing.assert_allclose(
        float(loss),
        float(stats["loss_transducer"]) + 0.3 * float(stats["loss_ctc"]),
        rtol=1e-5,
    )


def test_transducer_greedy_decode_jit():
    key = jax.random.PRNGKey(2)
    v, d, h = 7, 12, 16
    joint = JointNetwork(vocab_size=v, joint_dim=8)
    pn = PredictionNetwork(vocab_size=v, embed_dim=8, hidden_dim=h, dropout_rate=0.0)
    enc = jax.random.normal(key, (2, 6, d))
    elens = jnp.array([6, 4])
    labels = jnp.array([[1, 2, -1]])
    pv = pn.init(key, labels)
    jp = joint.init(key, enc[:, :, None, :], jnp.zeros((2, 1, 1, h)))

    def pred_apply(state, label):
        return pn.apply(pv, state, label, method="step")

    def joint_apply(enc_t, g):
        return joint.apply(jp, enc_t[:, None, None], g[:, None, None]).reshape(
            enc_t.shape[0], -1
        )

    init_state = pn.apply(pv, 2, method="initial_state")
    f = jax.jit(
        lambda enc, elens: transducer_greedy_decode(
            enc, elens, pred_apply, joint_apply, init_state
        )
    )
    tokens, count = f(enc, elens)
    assert tokens.shape == (2, 18)
    assert int(count.max()) <= 18 and bool(jnp.all(count >= 0))
