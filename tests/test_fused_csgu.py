"""Fused CSGU Pallas kernel parity with the XLA path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tailored_avsr_tpu.ops.cgmlp import ConvolutionalGatingMLP
from tailored_avsr_tpu.ops.fused_csgu import fused_csgu


def test_fused_csgu_matches_xla():
    key = jax.random.PRNGKey(0)
    b, t, u = 2, 19, 32  # odd T exercises sublane padding
    x = jax.random.normal(key, (b, t, u))
    gamma = jax.random.normal(jax.random.fold_in(key, 1), (u // 2,)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.fold_in(key, 2), (u // 2,)) * 0.1
    kernel = jax.random.normal(jax.random.fold_in(key, 3), (7, 1, u // 2)) * 0.2
    cbias = jax.random.normal(jax.random.fold_in(key, 4), (u // 2,)) * 0.1

    x_r, x_g = x[..., : u // 2], x[..., u // 2 :]
    mean = jnp.mean(x_g, -1, keepdims=True)
    var = jnp.mean((x_g - mean) ** 2, -1, keepdims=True)
    ln = (x_g - mean) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    conv = jax.lax.conv_general_dilated(
        ln, kernel, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=u // 2,
    ) + cbias
    want = x_r * conv

    got = fused_csgu(x, gamma, beta, kernel, cbias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_cgmlp_fused_flag_matches():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 11, 16))
    m0 = ConvolutionalGatingMLP(linear_units=24, kernel_size=5, use_fused=False)
    params = m0.init(key, x)
    want = m0.apply(params, x)
    m1 = ConvolutionalGatingMLP(linear_units=24, kernel_size=5, use_fused=True)
    with pltpu.force_tpu_interpret_mode():
        got = m1.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
