"""Conformer encoder tests: ASR encoder choice + conventional-AV sublayers;
label smoothing smoothing=0 regression."""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.models.conformer import ConformerEncoder, ConformerEncoderLayer
from tailored_avsr_tpu.models.conventional import ConventionalEncoder
from tailored_avsr_tpu.ops.losses import label_smoothing_loss
from tailored_avsr_tpu.ops.posenc import RelPositionalEncoding
from tailored_avsr_tpu.tasks import ASRTask


def test_conformer_asr_via_factory():
    cfg = argparse.Namespace(
        task="asr", model="espnet", frontend="default", frontend_conf={},
        encoder="conformer",
        encoder_conf={"output_size": 32, "attention_heads": 4, "linear_units": 48,
                      "cnn_module_kernel": 7, "num_blocks": 2,
                      "input_layer": "conv2d", "dropout_rate": 0.0},
        decoder="transformer",
        decoder_conf={"attention_heads": 4, "linear_units": 48, "num_blocks": 1,
                      "dropout_rate": 0.0},
        ctc_conf={}, model_conf={"ctc_weight": 0.3},
    )
    tokens = ["<blank>", "<unk>"] + list("ABCDE") + ["<sos/eos>"]
    model = ASRTask.build_model(cfg, tokens)
    key = jax.random.PRNGKey(0)
    wav = jax.random.normal(key, (2, 6400))
    lens = jnp.array([6400, 3200])
    text = jnp.array([[2, 3, 4, -1], [5, 6, -1, -1]])
    tlens = jnp.array([3, 2])
    v = model.init({"params": key}, wav, lens, text, tlens)
    assert "batch_stats" in v  # conformer conv module carries BatchNorm
    loss, stats = model.apply(v, wav, lens, text, tlens)
    assert np.isfinite(float(loss))
    (loss2, _), new_vars = model.apply(
        v, wav, lens, text, tlens, deterministic=False,
        rngs={"dropout": key, "skip": key, "specaug": key},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(loss2)) and "batch_stats" in new_vars


def test_conventional_av_conformer_sublayers():
    key = jax.random.PRNGKey(1)
    enc = ConventionalEncoder(
        output_size=32, attention_heads=4, linear_units=48,
        cgmlp_linear_units=48, cgmlp_conv_kernel=7, num_blocks=2,
        dropout_rate=0.0, attention_dropout_rate=0.0,
        encoder_class_type="conformer", cnn_module_kernel=7,
    )
    a = jax.random.normal(key, (2, 9, 32))
    pos = RelPositionalEncoding(0.0)
    a_, ap = pos.apply(pos.init(key, a), a)
    m = jnp.arange(9)[None, :] < jnp.array([9, 5])[:, None]
    ev = enc.init(key, a_, ap, m, a_, ap, m)
    ao, _, vo, _, aux = enc.apply(ev, a_, ap, m, a_, ap, m)
    assert ao.shape == (2, 9, 32) and vo.shape == (2, 9, 32)
    # conformer layers have a conv module, no branch merge
    assert "acoustic_layer_0" in ev["params"]
    assert "conv_module" in ev["params"]["acoustic_layer_0"]


def test_label_smoothing_zero_is_cross_entropy():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 3, 5).astype(np.float32))
    targets = jnp.array([[1, 2, -1], [3, -1, -1]])
    loss = float(label_smoothing_loss(logits, targets, smoothing=0.0))
    logp = jax.nn.log_softmax(logits, -1)
    want = -(logp[0, 0, 1] + logp[0, 1, 2] + logp[1, 0, 3]) / 2
    np.testing.assert_allclose(loss, float(want), rtol=1e-5)
    assert np.isfinite(loss)
