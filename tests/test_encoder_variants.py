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
