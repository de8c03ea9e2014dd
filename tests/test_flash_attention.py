"""Pallas fused attention: parity with the XLA reference implementation
(interpret mode on CPU; the real kernel runs in bench on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.flash_attention import flash_attention
from tailored_avsr_tpu.ops.attention import _masked_softmax


def reference_attention(q, k, v, bias, mask):
    dk = q.shape[-1]
    scores = (jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias) / dk ** 0.5
    attn = _masked_softmax(scores, mask)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


def test_flash_matches_reference():
    key = jax.random.PRNGKey(0)
    b, h, t, dk = 2, 4, 50, 32
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, h, t, dk))
    k = jax.random.normal(ks[1], (b, h, t, dk))
    v = jax.random.normal(ks[2], (b, h, t, dk))
    bias = jax.random.normal(ks[3], (b, h, t, t))
    mask = jnp.arange(t)[None, :] < jnp.array([t, 30])[:, None]
    want = reference_attention(q, k, v, bias, mask)
    got = flash_attention(q, k, v, bias, mask, block_q=16, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_no_bias_no_mask():
    key = jax.random.PRNGKey(1)
    b, h, t, dk = 1, 2, 33, 16  # odd T exercises padding
    q = jax.random.normal(key, (b, h, t, dk))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dk))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dk))
    want = reference_attention(q, k, v, jnp.zeros((b, h, t, t)), None)
    got = flash_attention(q, k, v, None, None, block_q=16, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_fully_masked_row_zero():
    key = jax.random.PRNGKey(2)
    b, h, t, dk = 1, 1, 8, 8
    q = jax.random.normal(key, (b, h, t, dk))
    mask = jnp.zeros((b, t), bool)  # everything masked
    got = flash_attention(q, q, q, None, mask, block_q=8, block_k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


def test_relpos_attention_flash_flag_matches_xla():
    """RelPositionMultiHeadedAttention(use_flash=True) == use_flash=False."""
    from tailored_avsr_tpu.ops.attention import RelPositionMultiHeadedAttention
    from tailored_avsr_tpu.ops.posenc import RelPositionalEncoding
    from jax.experimental.pallas import tpu as pltpu

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 20, 32))
    pos = RelPositionalEncoding(0.0)
    xs, pemb = pos.apply(pos.init(key, x), x)
    mask = jnp.arange(20)[None, :] < jnp.array([20, 13])[:, None]
    m0 = RelPositionMultiHeadedAttention(num_heads=4, use_flash=False)
    params = m0.init(key, xs, xs, xs, pemb, mask)
    want = m0.apply(params, xs, xs, xs, pemb, mask)
    m1 = RelPositionMultiHeadedAttention(num_heads=4, use_flash=True)
    with pltpu.force_tpu_interpret_mode():
        got = m1.apply(params, xs, xs, xs, pemb, mask)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(got[1, :13]), np.asarray(want[1, :13]), atol=3e-5
    )


def test_flash_relpos_inkernel_matches_reference():
    """flash_attention_relpos (in-kernel Toeplitz via barrel shifter) ==
    rel_shift(q_v @ p^T) bias reference, including multi-tile diagonals."""
    from tailored_avsr_tpu.ops.attention import rel_shift
    from tailored_avsr_tpu.ops.flash_attention import flash_attention_relpos
    from tailored_avsr_tpu.ops.posenc import rel_pos_table

    key = jax.random.PRNGKey(4)
    b, h, t, dk = 2, 2, 200, 32  # t > 128 exercises ki != qi diagonals
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, h, t, dk))
    k = jax.random.normal(ks[1], (b, h, t, dk))
    v = jax.random.normal(ks[2], (b, h, t, dk))
    qv = jax.random.normal(ks[3], (b, h, t, dk))
    pos = jax.random.normal(ks[4], (h, 2 * t - 1, dk)) * 0.5
    mask = jnp.arange(t)[None, :] < jnp.array([t, 130])[:, None]
    bias = rel_shift(jnp.einsum("bhqd,hkd->bhqk", qv, pos))
    want = reference_attention(q, k, v, bias, mask)
    got = flash_attention_relpos(q, k, v, qv, pos, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
    # sanity: rel_pos_table provides the (2T-1) layout this kernel consumes
    assert rel_pos_table(t, dk).shape == (2 * t - 1, dk)


def test_flash_batch_partitioning_under_mesh():
    """The flash kernels carry a custom_partitioning batch rule: under a
    data mesh the pallas_call runs per batch shard (no replication
    fallback), output batch-sharded, numerics identical to single-device."""
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from tailored_avsr_tpu.parallel.mesh import make_mesh
    from tailored_avsr_tpu.ops.flash_attention import flash_attention_relpos

    mesh = make_mesh(8)
    key = jax.random.PRNGKey(5)
    b, h, t, dk = 8, 2, 40, 16
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, h, t, dk))
    k = jax.random.normal(ks[1], (b, h, t, dk))
    v = jax.random.normal(ks[2], (b, h, t, dk))
    bias = jax.random.normal(ks[3], (b, h, t, t))
    mask = jnp.arange(t)[None, :] < jnp.full((b, 1), t - 7)
    want = flash_attention(q, k, v, bias, mask, block_q=16, block_k=16,
                           interpret=True)

    ds = NamedSharding(mesh, P("data"))
    args = [jax.device_put(x, ds) for x in (q, k, v, bias, mask)]
    with mesh:
        got = jax.jit(
            lambda *a: flash_attention(*a, block_q=16, block_k=16,
                                       interpret=True)
        )(*args)
    assert "data" in str(got.sharding.spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # rel-pos variant: per-head table replicated, batch operands sharded
    qv = jax.random.normal(ks[4], (b, h, t, dk))
    pos = jax.random.normal(jax.random.fold_in(key, 9), (h, 2 * t - 1, dk))
    want2 = flash_attention_relpos(q, k, v, qv, pos, mask=mask, block=16,
                                   interpret=True)
    with mesh:
        got2 = jax.jit(
            lambda a, b_, c, d, e, f: flash_attention_relpos(
                a, b_, c, d, e, mask=f, block=16, interpret=True
            )
        )(*[jax.device_put(x, ds) for x in (q, k, v, qv)], pos,
          jax.device_put(mask, ds))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=2e-5)


def test_relpos_attention_trains_with_zero_dropout():
    """Training (deterministic=False) must never route through the Pallas
    flash kernels — they are custom_partitioning primitives with no VJP.
    Regression: the gate used to admit them whenever dropout_rate == 0, so a
    model configured with attention_dropout 0 + use_flash crashed at grad
    time (found by the r5 flagship overfit, which disables dropout)."""
    from tailored_avsr_tpu.ops.attention import RelPositionMultiHeadedAttention
    from tailored_avsr_tpu.ops.posenc import RelPositionalEncoding

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 16, 32))
    pos = RelPositionalEncoding(0.0)
    xs, pemb = pos.apply(pos.init(key, x), x)
    mask = jnp.arange(16)[None, :] < jnp.array([16, 11])[:, None]
    m = RelPositionMultiHeadedAttention(
        num_heads=4, dropout_rate=0.0, use_flash=True
    )
    params = m.init({"params": key, "dropout": key}, xs, xs, xs, pemb, mask,
                    deterministic=False)

    def loss(p):
        out = m.apply(p, xs, xs, xs, pemb, mask, deterministic=False,
                      rngs={"dropout": key})
        return jnp.sum(out**2)

    val, g = jax.value_and_grad(loss)(params)
    assert jnp.isfinite(val)
    assert all(jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree_util.tree_leaves(g))
