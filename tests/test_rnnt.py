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


def brute_force_multiblank_nll(logp, labels, blank, durations, sigma):
    """-log P(labels | x) enumerating blank/big-blank/emit transitions.

    Big blank i (duration durations[i]) reads index blank - 1 - i; every
    transition is under-normalized by sigma (multi-blank paper semantics,
    matching espnet's vendored NeMo MultiblankRNNTLossNumba as the reference
    uses it, /root/reference/src/models/espnet_model.py:130-141)."""
    t_max = logp.shape[0]
    u_max = len(labels)
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def beta(t, u):
        # log prob of completing the alignment from state (t, u)
        cands = []
        if u < u_max:
            cands.append(float(logp[t, u, labels[u]]) - sigma + beta(t, u + 1))
        arcs = [(1, blank)] + [
            (d, blank - 1 - i) for i, d in enumerate(durations)
        ]
        for d, sym in arcs:
            if t + d == t_max and u == u_max:
                cands.append(float(logp[t, u, sym]) - sigma)
            elif t + d < t_max:
                cands.append(float(logp[t, u, sym]) - sigma + beta(t + d, u))
        return float(np.logaddexp.reduce(cands)) if cands else -np.inf

    return -beta(0, 0)


def test_multiblank_rnnt_loss_matches_brute_force():
    from tailored_avsr_tpu.ops.rnnt import multiblank_rnnt_loss

    rng = np.random.RandomState(2)
    b, t, u, v = 2, 6, 2, 8
    blank, durs, sigma = 7, (2, 4), 0.05
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    labels = np.array([[1, 2], [3, -1]])
    tlens = np.array([6, 4])
    ulens = np.array([2, 1])
    got = float(
        multiblank_rnnt_loss(
            jnp.asarray(logits), jnp.asarray(tlens), jnp.asarray(labels),
            jnp.asarray(ulens), blank_id=blank, durations=durs, sigma=sigma,
        )
    )
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    want = (
        brute_force_multiblank_nll(logp[0, :6, :3], [1, 2], blank, durs, sigma)
        + brute_force_multiblank_nll(logp[1, :4, :2], [3], blank, durs, sigma)
    ) / 2
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_multiblank_rnnt_loss_sigma_zero_single_dur_grad():
    """Gradients stay finite, and with a duration longer than T the big
    blank can never fire mid-path: only the terminal jump survives."""
    from tailored_avsr_tpu.ops.rnnt import multiblank_rnnt_loss

    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 5, 4, 9).astype(np.float32))
    fn = lambda l: multiblank_rnnt_loss(  # noqa: E731
        l, jnp.array([5, 4]), jnp.array([[1, 2, 3], [4, 5, -1]]),
        jnp.array([3, 2]), blank_id=8, durations=(2,), sigma=0.1,
    )
    assert bool(jnp.all(jnp.isfinite(jax.grad(fn)(logits))))
    # jit/compile parity
    np.testing.assert_allclose(float(fn(logits)), float(jax.jit(fn)(logits)),
                               rtol=1e-5)


def test_multiblank_greedy_matches_standard_when_big_blanks_suppressed():
    """With big-blank logits forced to -inf, multi-blank greedy reduces to
    the standard greedy decode (same tokens, same counts)."""
    from tailored_avsr_tpu.ops.rnnt import multiblank_greedy_decode

    key = jax.random.PRNGKey(4)
    v, d, h = 9, 12, 16
    durs = (2, 4)
    blank = len(durs)  # <blank4>, <blank2>, <blank>, labels...
    joint = JointNetwork(vocab_size=v, joint_dim=8)
    pn = PredictionNetwork(vocab_size=v, embed_dim=8, hidden_dim=h,
                           dropout_rate=0.0)
    pv = pn.init(key, jnp.array([[3, 4, -1]]))
    jp = joint.init(key, jnp.zeros((1, 1, 1, d)), jnp.zeros((1, 1, 1, h)))

    def pred_apply(state, label):
        return pn.apply(pv, state, label, method="step")

    def joint_raw(enc_t, g):
        return joint.apply(jp, enc_t[:, None, None], g[:, None, None]).reshape(
            enc_t.shape[0], -1
        )

    def joint_no_bb(enc_t, g):
        logits = joint_raw(enc_t, g)
        return logits.at[:, :blank].set(-1e30)  # kill big blanks

    def joint_std(enc_t, g):
        # same vocab seen through standard greedy: blank index = blank
        return joint_no_bb(enc_t, g)

    enc = jax.random.normal(key, (2, 6, d))
    elens = jnp.array([6, 4])
    init = pn.apply(pv, 2, method="initial_state")
    toks_mb, n_mb = multiblank_greedy_decode(
        enc, elens, pred_apply, joint_no_bb, init, blank_id=blank,
        durations=durs,
    )
    toks_std, n_std = transducer_greedy_decode(
        enc, elens, pred_apply, joint_std, init, blank_id=blank,
    )
    assert np.array_equal(np.asarray(n_mb), np.asarray(n_std))
    for i in range(2):
        got = np.asarray(toks_mb[i, : int(n_mb[i])])
        want = np.asarray(toks_std[i, : int(n_std[i])])
        np.testing.assert_array_equal(got, want)


def test_multiblank_greedy_big_blank_skips_frames():
    """A rigged joint emits each visited frame's label once and then picks
    <blank2>: with duration-2 jumps only frames 0, 2, 4 are visited, so the
    decode must produce exactly their labels [2, 4, 6]."""
    from tailored_avsr_tpu.ops.rnnt import multiblank_greedy_decode

    t_total, v = 6, 9
    durs = (2,)
    blank = 1  # layout: [<blank2>, <blank>, labels 2..8]

    def pred_apply(state, label):
        # prediction "network": remember the last emitted label in g
        return state, label[:, None].astype(jnp.float32)

    def joint_apply(enc_t, g):
        # frame f's label is 2 + f; emit it unless it was just emitted
        # (g carries it), then take the big blank
        frame = enc_t[:, 0].astype(jnp.int32)
        lab = 2 + frame
        already = g[:, 0].astype(jnp.int32) == lab
        logits = jnp.full((enc_t.shape[0], v), -10.0)
        logits = jnp.where(
            already[:, None],
            logits.at[:, 0].set(5.0),  # <blank2>
            logits.at[jnp.arange(enc_t.shape[0]), lab].set(5.0),
        )
        return logits

    enc = jnp.arange(t_total, dtype=jnp.float32)[None, :, None] * jnp.ones(
        (1, t_total, 3)
    )
    toks, n = multiblank_greedy_decode(
        enc, jnp.array([t_total]), pred_apply, joint_apply,
        (jnp.zeros((1, 4)),), blank_id=blank, durations=durs,
    )
    assert int(n[0]) == 3
    np.testing.assert_array_equal(np.asarray(toks[0, :3]), [2, 4, 6])


def test_multiblank_transducer_end_to_end(tmp_path):
    """transducer_multi_blank_durations in model_conf: the task factory
    extends the vocab (<blank{d}> just before <blank>, ref
    src/tasks/asr.py:495-502), the train loss runs the multi-blank DP, and
    Speech2Text decodes with the multi-blank greedy search."""
    import types

    from tailored_avsr_tpu.inference import Speech2Text
    from tests.test_fused_beam_ci import make_batch, make_cfg

    cfg = make_cfg(tmp_path)
    cfg.decoder = "transducer"
    cfg.decoder_conf = {"embed_size": 16, "hidden_size": 16, "num_layers": 1,
                        "dropout_rate": 0.0}
    cfg.joint_net_conf = {"joint_space_size": 16}
    cfg.model_conf = {"ctc_weight": 0.3,
                      "transducer_multi_blank_durations": [2, 4],
                      "transducer_multi_blank_sigma": 0.05}
    cfg.inference_conf = {"beam_size": 1}

    s2t = Speech2Text(cfg)
    # vocab extension: big blanks inserted just before <blank>, which moves
    # from index 0 to index 2; <blank4> (second duration) lands at index 0
    tl = s2t.converter.token_list
    assert tl[:3] == ["<blank4>", "<blank2>", "<blank>"], tl[:4]
    assert s2t.model.transducer_multi_blank_durations == (2, 4)

    batch = make_batch()
    # text ids must live in the extended vocab (labels start at index 3 now)
    batch["text"] = batch["text"] + 3
    res = s2t(batch)  # multi-blank greedy decode
    assert len(res) == 2

    # the training loss runs the multi-blank DP and is finite
    import jax

    variables = s2t.variables
    loss, stats = s2t.model.apply(
        variables,
        jnp.asarray(batch["speech"]), jnp.asarray(batch["speech_lengths"]),
        jnp.asarray(batch["text"]), jnp.asarray(batch["text_lengths"]),
    )
    assert bool(jnp.isfinite(loss))
    assert "loss_transducer" in stats
