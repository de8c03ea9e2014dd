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


def test_fused_csgu_batch_partitioning_under_mesh():
    """Under a data mesh the CSGU kernel runs per batch shard (its
    custom_partitioning rule), parameters replicated, numerics identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from tailored_avsr_tpu.parallel.mesh import make_mesh
    from tailored_avsr_tpu.ops.fused_csgu import fused_csgu

    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    b, t, u = 8, 12, 32
    x = jnp.asarray(rng.randn(b, t, u), jnp.float32)
    gamma = jnp.ones((u // 2,))
    beta = jnp.zeros((u // 2,))
    w = jnp.asarray(rng.randn(5, 1, u // 2), jnp.float32) * 0.1
    cb = jnp.zeros((u // 2,))
    want = fused_csgu(x, gamma, beta, w, cb, interpret=True)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        got = jax.jit(lambda *a: fused_csgu(*a, interpret=True))(
            xs, gamma, beta, w, cb
        )
    assert "data" in str(got.sharding.spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
