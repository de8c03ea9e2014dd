"""Tests: E-Branchformer merge, mixed-precision train step, espnet-style
initialize, linear pre/post-encoders, global-MVN stats script."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_models import small_branchformer  # noqa: E402


def test_e_branchformer_merge():
    key = jax.random.PRNGKey(0)
    enc = small_branchformer(merge_method="concat", merge_conv_kernel=3)
    x = jax.random.normal(key, (2, 21, 20))
    ilens = jnp.array([21, 15])
    params = enc.init(key, x, ilens)
    assert "depthwise_conv_fusion" in params["params"]["layer_0"]
    out, olens, _ = enc.apply(params, x, ilens)
    assert out.shape[-1] == 32 and np.isfinite(np.asarray(out)).all()


def test_e_branchformer_task_registry():
    import argparse

    from tailored_avsr_tpu.tasks import ASRTask

    cfg = argparse.Namespace(
        task="asr", model="espnet", frontend="default", frontend_conf={},
        encoder="e_branchformer",
        encoder_conf={"output_size": 32, "attention_heads": 4, "linear_units": 48,
                      "cgmlp_linear_units": 48, "cgmlp_conv_kernel": 7,
                      "num_blocks": 1, "input_layer": "conv2d", "dropout_rate": 0.0},
        ctc_conf={}, model_conf={"ctc_weight": 1.0},
    )
    tokens = ["<blank>", "<unk>"] + list("ABC") + ["<sos/eos>"]
    model = ASRTask.build_model(cfg, tokens)
    assert model.encoder.merge_method == "concat"
    assert model.encoder.merge_conv_kernel == 3


def test_mixed_precision_train_step():
    from tailored_avsr_tpu.train import create_train_state, make_train_step, set_optimizer
    from tailored_avsr_tpu.models import ASRModel, CTCHead

    key = jax.random.PRNGKey(1)
    enc = small_branchformer(num_blocks=1)
    model = ASRModel(vocab_size=8, encoder=enc, ctc=CTCHead(8), ctc_weight=1.0)
    feats = jax.random.normal(key, (2, 45, 20))
    flens = jnp.array([45, 30])
    text = jnp.array([[1, 2, -1], [3, -1, -1]])
    tlens = jnp.array([2, 1])
    variables = model.init(key, feats, flens, text, tlens)
    ts = {"optimizer": "adam", "scheduler": "constant", "learning_rate": 1e-3,
          "accum_grad": 1, "epochs": 1}
    tx, _ = set_optimizer(ts, 32, 10)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, compute_dtype=jnp.bfloat16)
    new_state, stats = step(state, (feats, flens, text, tlens), key)
    assert np.isfinite(float(stats["loss"]))
    # master params stay f32
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.dtype == jnp.float32


def test_initialize_schemes():
    from tailored_avsr_tpu.utils.initialize import initialize

    key = jax.random.PRNGKey(2)
    enc = small_branchformer(num_blocks=1)
    x = jax.random.normal(key, (1, 21, 20))
    variables = enc.init(key, x, jnp.array([21]))
    out = initialize(variables, "xavier_uniform", seed=3)
    k0 = np.asarray(
        jax.tree_util.tree_leaves(variables["params"]["layer_0"]["feed_forward"])[1]
    )
    k1 = np.asarray(
        jax.tree_util.tree_leaves(out["params"]["layer_0"]["feed_forward"])[1]
    )
    assert k0.shape == k1.shape and not np.allclose(k0, k1)
    # norms reset to 1, biases to 0
    np.testing.assert_allclose(
        np.asarray(out["params"]["after_norm"]["scale"]), 1.0
    )


def test_linear_pre_post_encoders():
    from tailored_avsr_tpu.models.prepostencoder import LinearPostencoder, LinearProjection

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 7, 10))
    lens = jnp.array([7, 5])
    pre = LinearProjection(output_size=16, dropout_rate=0.0)
    y, l2 = pre.apply(pre.init(key, x, lens), x, lens)
    assert y.shape == (2, 7, 16)
    post = LinearPostencoder(output_size=12)
    z, _ = post.apply(post.init(key, y, lens), y, lens)
    assert z.shape == (2, 7, 12)


def test_sliding_window_frontend_and_gated_choices():
    from tailored_avsr_tpu.ops.frontend_audio import SlidingWindowFrontend
    from tailored_avsr_tpu.tasks.common import build_frontend

    fe = SlidingWindowFrontend()
    v = fe.init(jax.random.PRNGKey(0), jnp.zeros((2, 3200)), jnp.array([3200, 1600]))
    out, lens = fe.apply(v, jnp.ones((2, 3200)), jnp.array([3200, 1600]))
    assert out.shape == (2, 18, 400)
    np.testing.assert_array_equal(np.asarray(lens), [18, 8])
    assert build_frontend("sliding_window", {}).output_size() == 400
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        build_frontend("whisper", {})


def test_fused_frontend():
    """espnet FusedFrontends semantics (reference src/tasks/asr.py:55,99):
    hop-gcd frame alignment, per-frontend linear projection to
    factor*proj_dim, reshape to the common rate, truncate to the shortest,
    concat on features."""
    from tailored_avsr_tpu.tasks.common import build_frontend

    fe = build_frontend("fused", {
        "frontends": [
            {"frontend_type": "default", "n_mels": 40, "hop_length": 160},
            {"frontend_type": "sliding_window", "hop_length": 320},
        ],
        "proj_dim": 24,
    })
    assert fe.output_size() == 48
    speech = jnp.asarray(np.random.RandomState(0).randn(2, 3200), jnp.float32)
    lens = jnp.array([3200, 1600])
    v = fe.init(jax.random.PRNGKey(0), speech, lens)
    out, out_lens = fe.apply(v, speech, lens)
    # default: 3200//160+1 = 21 frames @hop160 (factor 1);
    # sliding_window: 1+(3200-400)//320 = 9 frames @hop320 (factor 2) -> 18.
    # row 2 (1600 samples): min(1600//160+1, 2*(1+(1600-400)//320)) = 8
    assert out.shape == (2, 18, 48)
    np.testing.assert_array_equal(np.asarray(out_lens), [18, 8])
    # per-stream content: first proj_dim features come from the log-mel
    # stream, projected — zero speech gives IDENTICAL rows across batch
    out2, _ = fe.apply(v, jnp.zeros_like(speech), lens)
    np.testing.assert_allclose(
        np.asarray(out2[0]), np.asarray(out2[1]), rtol=1e-6, atol=1e-6
    )
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        build_frontend("fused", {
            "frontends": [{"frontend_type": "s3prl"}],
        }).init(jax.random.PRNGKey(0), speech, lens)


def test_global_mvn_stats_script(tmp_path):
    from tests.synthetic import make_synthetic_corpus

    csv_path, _ = make_synthetic_corpus(str(tmp_path), n=2)
    import importlib

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    gm = importlib.import_module("compute_global_mvn_stats")
    out = str(tmp_path / "stats.npz")
    gm.main(["--dataset", csv_path, "--output", out])
    stats = np.load(out)
    assert stats["mean"].shape == (80,) and (stats["std"] > 0).all()


def test_device_normalize_inference_path(tmp_path):
    """uint8-video / int16-audio inference: _dequantize matches the host
    Normalise chain; stream() equals sequential __call__; CLI artifacts OK."""
    import types
    import jax.numpy as jnp
    from tailored_avsr_tpu.inference import Speech2Text

    cfg = types.SimpleNamespace(
        task="avsr",
        token_list=None,  # set below
        acoustic_frontend="default",
        acoustic_frontend_conf={"n_fft": 512, "win_length": 400,
                                "hop_length": 160, "n_mels": 20},
        visual_frontend="conv3dresnet18",
        visual_frontend_conf={},
        encoder="tailored",
        encoder_conf={
            "output_size": 32, "attention_heads": 4, "linear_units": 48,
            "cgmlp_linear_units": 48, "cgmlp_conv_kernel": 7, "num_blocks": 2,
            "dropout_rate": 0.0, "acoustic_use_attn": [True, False],
            "visual_use_attn": [False, True],
        },
        audiovisual_fusion="adaptive",
        audiovisual_fusion_conf={"output_size": 32, "hidden_units": 48},
        acoustic_embed="default", acoustic_embed_conf={"input_layer": "conv2d"},
        visual_embed="default", visual_embed_conf={"input_layer": "linear"},
        decoder="transformer",
        decoder_conf={"attention_heads": 4, "linear_units": 48,
                      "num_blocks": 1, "dropout_rate": 0.0},
        model="espnet", model_conf={"ctc_weight": 0.3},
        inference_conf={"beam_size": 2, "ctc_weight": 0.3,
                        "device_normalize": True,
                        "video_mean": 0.421, "video_std": 0.165},
    )
    import os
    tok = tmp_path / "tokens.txt"
    tok.write_text("\n".join(["<blank>", "<unk>"] +
                              [chr(65 + i) for i in range(6)] + ["<sos/eos>"]))
    cfg.token_list = str(tok)
    s2t = Speech2Text(cfg)

    rng = np.random.RandomState(0)
    B, S, F = 2, 640 * 8, 8
    vid_u8 = (rng.rand(B, F, 88, 88) * 250).astype(np.uint8)
    audio = (rng.randn(B, S) * 0.1).astype(np.float32)
    batch = {
        "audio": audio, "audio_lengths": np.full((B,), S, np.int32),
        "video": vid_u8, "video_lengths": np.full((B,), F, np.int32),
        "text": np.ones((B, 4), np.int32),
        "text_lengths": np.full((B,), 4, np.int32),
    }
    # _dequantize matches the host transform chain
    deq = s2t._dequantize((jnp.asarray(audio), jnp.asarray(batch["audio_lengths"]),
                           jnp.asarray(vid_u8), jnp.asarray(batch["video_lengths"])))
    want = (vid_u8.astype(np.float32) / 250.0 - 0.421) / 0.165
    np.testing.assert_allclose(np.asarray(deq[2]), want, rtol=1e-5)
    # int16 audio dequantizes to /32768
    a16 = np.clip(audio * 32768, -32768, 32767).astype(np.int16)
    deq16 = s2t._dequantize((jnp.asarray(a16), jnp.asarray(batch["audio_lengths"]),
                             jnp.asarray(vid_u8), jnp.asarray(batch["video_lengths"])))
    np.testing.assert_allclose(np.asarray(deq16[0]), a16.astype(np.float32) / 32768.0)

    # decode works on the quantized batch; stream == sequential
    res_seq = s2t(s2t.device_put_batch(batch))
    streamed = list(s2t.stream([dict(batch), dict(batch)]))
    assert len(streamed) == 2
    for _, res in streamed:
        assert [r[0] for r in res] == [r[0] for r in res_seq]


def test_bf16_training_convergence_parity():
    """bf16 compute (f32 master params) tracks the f32 loss trajectory on a
    small overfitting problem (SURVEY.md §2.4 AMP row; ROADMAP bf16 item)."""
    from tailored_avsr_tpu.train import (
        create_train_state, make_train_step, set_optimizer,
    )
    from tailored_avsr_tpu.models import ASRModel, CTCHead

    key = jax.random.PRNGKey(5)
    enc = small_branchformer(num_blocks=1)
    model = ASRModel(vocab_size=8, encoder=enc, ctc=CTCHead(8), ctc_weight=1.0)
    feats = jax.random.normal(key, (4, 45, 20))
    flens = jnp.array([45, 45, 40, 30])
    text = jnp.array([[1, 2, -1], [3, 4, -1], [5, -1, -1], [2, 6, 7]])
    tlens = jnp.array([2, 2, 1, 3])
    variables = model.init(key, feats, flens, text, tlens)
    ts = {"optimizer": "adam", "scheduler": "constant", "learning_rate": 3e-3,
          "accum_grad": 1, "epochs": 1}

    losses = {}
    for dt in (jnp.float32, jnp.bfloat16):
        tx, _ = set_optimizer(ts, 32, 10)
        state = create_train_state(variables, tx)
        step = jax.jit(make_train_step(model, tx, compute_dtype=dt))
        traj = []
        for i in range(25):
            state, stats = step(state, (feats, flens, text, tlens),
                                jax.random.PRNGKey(i))
            traj.append(float(stats["loss"]))
        losses[dt.__name__] = traj
    f32, bf16 = losses["float32"], losses["bfloat16"]
    # both optimize, and the trajectories stay close in relative terms
    assert f32[-1] < 0.7 * f32[0] and bf16[-1] < 0.7 * bf16[0]
    rel = abs(bf16[-1] - f32[-1]) / abs(f32[-1])
    assert rel < 0.25, (f32[-1], bf16[-1])


def test_bf16_activations_propagate():
    """A bf16 model graph must COMPUTE in bf16, not merely store bf16 params:
    flax modules here carry no explicit dtype, so the activation dtype follows
    the inputs — and the ops that internally run f32 (log-mel FFT, MVN stats,
    BatchNorm with f32 running stats) must hand bf16 back. Regression for the
    silent f32 promotion that kept the 'bf16' decode graph all-f32
    (ops/frontend_audio.py, ops/normalize.py, models/frontends.py)."""
    from tailored_avsr_tpu.ops.frontend_audio import LogMelFrontend
    from tailored_avsr_tpu.ops.normalize import GlobalMVN
    from tailored_avsr_tpu.models.frontends import Conv3dResNet18

    key = jax.random.PRNGKey(7)
    wav = jax.random.normal(key, (2, 3200), jnp.bfloat16)
    fe = LogMelFrontend()
    feats, flens = fe.apply(fe.init(key, wav, jnp.array([3200, 1600])),
                            wav, jnp.array([3200, 1600]))
    assert feats.dtype == jnp.bfloat16

    mvn = GlobalMVN(feature_size=80)
    v = mvn.init(key, feats, flens)
    y, _ = mvn.apply(v, feats, flens)
    assert y.dtype == jnp.bfloat16
    # the stats buffers themselves stay f32
    assert v["stats"]["mean"].dtype == jnp.float32

    vid = jax.random.normal(key, (1, 2, 24, 24), jnp.bfloat16)
    vf = Conv3dResNet18()
    vv = vf.init(key, vid, jnp.array([2]), train=False)
    out, _ = vf.apply(vv, vid, jnp.array([2]), train=False)
    assert out.dtype == jnp.bfloat16  # f32 BN stats must not leak out
    # training mode too (batch stats computed in f32, output cast back)
    out_t, _ = vf.apply(vv, vid, jnp.array([2]), train=True,
                        mutable=["batch_stats"])[0]
    assert out_t.dtype == jnp.bfloat16


def test_negative_maxlenratio_constant_cap(tmp_path):
    """espnet semantics: maxlenratio < 0 means |maxlenratio| is a CONSTANT
    max output length regardless of input frames (ref avsr_inference.py:
    871-872). Hypotheses must never exceed it."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_fused_beam_ci import make_batch, make_cfg

    from tailored_avsr_tpu.inference import Speech2Text

    s2t = Speech2Text(make_cfg(tmp_path, maxlenratio=-2.0, nbest=2))
    res = s2t.nbest(make_batch(b=2))  # [(text, tokens, ids, score)] lists
    assert res and all(len(h[2]) <= 2 for hyps in res for h in hyps)
    # sanity: the uncapped decode of the same inputs CAN run longer
    free = Speech2Text(make_cfg(tmp_path)).nbest(make_batch(b=2))
    assert max(len(h[2]) for hyps in free for h in hyps) >= 1
