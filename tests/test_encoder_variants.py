"""Registered-but-less-used encoder variants: fast_selfattn + abs_pos,
scaled_abs_pos, plain selfattn, fixed_ave tailored config combinations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tailored_avsr_tpu.models.branchformer import BranchformerEncoder
from tailored_avsr_tpu.models.tailored import TailoredEncoder
from tailored_avsr_tpu.ops.posenc import AbsolutePositionalEncoding


@pytest.mark.parametrize(
    "att,pos",
    [
        ("fast_selfattn", "abs_pos"),
        ("fast_selfattn", "scaled_abs_pos"),
        ("selfattn", "abs_pos"),
    ],
)
def test_branchformer_abs_pos_variants(att, pos):
    key = jax.random.PRNGKey(0)
    enc = BranchformerEncoder(
        output_size=32, attention_heads=4, linear_units=48,
        cgmlp_linear_units=48, cgmlp_conv_kernel=7, num_blocks=2,
        input_layer="conv2d", dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_layer_type=att, pos_enc_layer_type=pos,
    )
    x = jax.random.normal(key, (2, 37, 20))
    ilens = jnp.array([37, 25])
    params = enc.init(key, x, ilens)
    out, olens, _ = enc.apply(params, x, ilens)
    assert out.shape[-1] == 32 and np.isfinite(np.asarray(out)).all()


def test_branchformer_legacy_rel_pos():
    """rel_pos_type='legacy' selects the pre-2020 (1, T, D) table + legacy
    shift; the encoder runs and differs numerically from the latest variant
    under identical params."""
    key = jax.random.PRNGKey(5)
    kw = dict(
        output_size=32, attention_heads=4, linear_units=48,
        cgmlp_linear_units=48, cgmlp_conv_kernel=7, num_blocks=2,
        input_layer="conv2d", dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_layer_type="rel_selfattn", pos_enc_layer_type="rel_pos",
    )
    legacy = BranchformerEncoder(rel_pos_type="legacy", **kw)
    latest = BranchformerEncoder(rel_pos_type="latest", **kw)
    x = jax.random.normal(key, (2, 37, 20))
    ilens = jnp.array([37, 25])
    params = legacy.init(key, x, ilens)
    out_leg, olens, _ = legacy.apply(params, x, ilens)
    assert out_leg.shape[-1] == 32 and np.isfinite(np.asarray(out_leg)).all()
    # identical param tree -> loadable either way, but different numerics
    out_new, _, _ = latest.apply(params, x, ilens)
    assert not np.allclose(np.asarray(out_leg), np.asarray(out_new), atol=1e-3)


def test_tailored_fast_selfattn():
    key = jax.random.PRNGKey(1)
    enc = TailoredEncoder(
        output_size=32, attention_heads=4, linear_units=48,
        cgmlp_linear_units=48, cgmlp_conv_kernel=7, num_blocks=2,
        dropout_rate=0.0, attention_dropout_rate=0.0,
        attention_layer_type="fast_selfattn",
        acoustic_use_attn=(True, False), visual_use_attn=(False, True),
    )
    a = jax.random.normal(key, (2, 9, 32))
    pe = AbsolutePositionalEncoding(0.0)
    a_ = pe.apply(pe.init(key, a), a)
    m = jnp.arange(9)[None, :] < jnp.array([9, 5])[:, None]
    params = enc.init(key, a_, None, m, a_, None, m)
    ao, _, vo, _, _ = enc.apply(params, a_, None, m, a_, None, m)
    assert ao.shape == (2, 9, 32) and np.isfinite(np.asarray(ao)).all()


def test_branchformer_single_branch_modes():
    """use_attn_branch / use_cgmlp_branch toggles (single-branch encoders)."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 21, 20))
    ilens = jnp.array([21, 15])
    for attn, cg in ((True, False), (False, True)):
        enc = BranchformerEncoder(
            output_size=32, attention_heads=4, linear_units=48,
            cgmlp_linear_units=48, cgmlp_conv_kernel=7, num_blocks=1,
            input_layer="conv2d", dropout_rate=0.0, positional_dropout_rate=0.0,
            use_attn_branch=attn, use_cgmlp_branch=cg,
        )
        params = enc.init(key, x, ilens)
        out, _, _ = enc.apply(params, x, ilens)
        assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# registry-breadth encoders: transformer / longformer / contextual block / rnn
# (reference choices at src/tasks/asr.py:145-166)
# ---------------------------------------------------------------------------
from tailored_avsr_tpu.tasks.common import build_encoder  # noqa: E402


@pytest.mark.parametrize(
    "name,conf",
    [
        ("transformer", {}),
        ("longformer", {"attention_windows": 8}),
        ("longformer", {"attention_windows": [4, 8]}),
        ("contextual_block_transformer",
         {"block_size": 8, "hop_size": 4, "look_ahead": 4}),
        ("contextual_block_conformer",
         {"block_size": 8, "hop_size": 4, "look_ahead": 4,
          "cnn_module_kernel": 5}),
    ],
)
def test_registry_encoders_forward(name, conf):
    key = jax.random.PRNGKey(3)
    conf = dict(
        conf, output_size=32, attention_heads=4, linear_units=48,
        num_blocks=2, input_layer="conv2d", dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    enc = build_encoder(name, conf)
    x = jax.random.normal(key, (2, 37, 20))
    ilens = jnp.array([37, 25])
    params = enc.init(key, x, ilens)
    out, olens, _ = enc.apply(params, x, ilens)
    assert out.shape[-1] == 32 and np.isfinite(np.asarray(out)).all()
    # padding must stay exactly zeroed/masked: recompute with extra pad frames
    x2 = jnp.concatenate([x, jnp.zeros((2, 8, 20))], axis=1)
    out2, olens2, _ = enc.apply(params, x2, ilens)
    assert np.array_equal(np.asarray(olens), np.asarray(olens2))


@pytest.mark.parametrize("name", ["rnn", "vgg_rnn"])
def test_rnn_encoders_forward(name):
    key = jax.random.PRNGKey(4)
    enc = build_encoder(
        name, {"output_size": 24, "hidden_size": 16, "num_layers": 2,
               "dropout_rate": 0.0},
    )
    x = jax.random.normal(key, (2, 20, 12))
    ilens = jnp.array([20, 13])
    params = enc.init(key, x, ilens)
    out, olens, _ = enc.apply(params, x, ilens)
    t_expect = 20 if name == "rnn" else 5
    assert out.shape == (2, t_expect, 24)
    assert np.isfinite(np.asarray(out)).all()
    # frames past the valid length are zeroed
    if name == "rnn":
        assert np.allclose(np.asarray(out[1, 13:]), 0.0)


def test_gated_external_encoders():
    for name in ("wav2vec2", "hubert", "whisper", "torchaudiohubert"):
        with pytest.raises(NotImplementedError):
            build_encoder(name, {})
    with pytest.raises(ValueError):
        build_encoder("nonexistent", {})


def test_longformer_window_actually_limits_attention():
    """A frame outside every window must not influence a far-away output."""
    key = jax.random.PRNGKey(5)
    enc = build_encoder(
        "longformer",
        {"output_size": 16, "attention_heads": 2, "linear_units": 24,
         "num_blocks": 1, "input_layer": None, "dropout_rate": 0.0,
         "positional_dropout_rate": 0.0, "attention_windows": 2},
    )
    x = jax.random.normal(key, (1, 12, 16))
    ilens = jnp.array([12])
    params = enc.init(key, x, ilens)
    out1, _, _ = enc.apply(params, x, ilens)
    x2 = x.at[0, 11].set(100.0)  # far from frame 0 (window half-width 1)
    out2, _, _ = enc.apply(params, x2, ilens)
    assert np.allclose(np.asarray(out1[0, 0]), np.asarray(out2[0, 0]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[0, 11]), np.asarray(out2[0, 11]), atol=1e-3)
