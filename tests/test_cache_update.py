"""Pallas in-place beam-cache column write: parity with the plain
at[].set() update (interpret mode on CPU; the real kernel runs inside the
TPU beam decode — decode/beam_search.py write_beam_column)."""

import numpy as np
import jax.numpy as jnp

from tailored_avsr_tpu.ops.cache_update import write_cache_column


def test_write_cache_column_all_positions():
    b, h, k, lc, dk = 2, 3, 4, 16, 5
    rng = np.random.RandomState(0)
    cache = jnp.asarray(rng.randn(b, h, k, lc, dk), jnp.float32)
    # positions covering block starts, interiors, and both block edges
    for pos in [0, 3, 7, 8, 12, 15]:
        col = jnp.asarray(rng.randn(b, h, k, dk), jnp.float32)
        got = write_cache_column(cache, col, pos, interpret=True)
        want = cache.at[:, :, :, pos, :].set(col)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        cache = got  # chain writes like the decode loop does


def test_write_cache_column_casts_dtype():
    b, h, k, lc, dk = 1, 2, 3, 8, 4
    rng = np.random.RandomState(1)
    cache = jnp.asarray(rng.randn(b, h, k, lc, dk), jnp.bfloat16)
    col = jnp.asarray(rng.randn(b, h, k, dk), jnp.float32)
    got = write_cache_column(cache, col, 5, interpret=True)
    want = cache.at[:, :, :, 5, :].set(col.astype(jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert got.dtype == jnp.bfloat16


def test_write_cache_column_rejects_unpadded_lc():
    cache = jnp.zeros((1, 2, 3, 10, 4))
    col = jnp.zeros((1, 2, 3, 4))
    try:
        write_cache_column(cache, col, 0, interpret=True)
    except ValueError as e:
        assert "multiple of 8" in str(e)
    else:
        raise AssertionError("expected ValueError for Lc % 8 != 0")


def test_write_cache_columns_kv_matches_single():
    from tailored_avsr_tpu.ops.cache_update import write_cache_columns_kv

    rng = np.random.RandomState(3)
    # batch sizes exercising gb grouping (power-of-2 split) and odd batches
    for b in (1, 2, 4, 6, 32):
        h, k, lc, dk = 2, 3, 16, 8
        ck = jnp.asarray(rng.randn(b, h, k, lc, dk), jnp.float32)
        cv = jnp.asarray(rng.randn(b, h, k, lc, dk), jnp.float32)
        for pos in (0, 7, 8, 15):
            kc = jnp.asarray(rng.randn(b, h, k, dk), jnp.float32)
            vc = jnp.asarray(rng.randn(b, h, k, dk), jnp.float32)
            gk, gv = write_cache_columns_kv(ck, cv, kc, vc, pos, interpret=True)
            np.testing.assert_array_equal(
                np.asarray(gk), np.asarray(ck.at[:, :, :, pos, :].set(kc))
            )
            np.testing.assert_array_equal(
                np.asarray(gv), np.asarray(cv.at[:, :, :, pos, :].set(vc))
            )
            ck, cv = gk, gv


def test_write_beam_columns_kv_dispatch_cpu():
    """CPU path of the beam-loop wrapper (DUS twin of the kernel)."""
    from tailored_avsr_tpu.decode.beam_search import write_beam_columns_kv

    rng = np.random.RandomState(4)
    b, h, km, lc, dk = 2, 2, 3, 8, 4
    n = b * km
    ck = jnp.asarray(rng.randn(b, h, km, lc, dk), jnp.float32)
    cv = jnp.asarray(rng.randn(b, h, km, lc, dk), jnp.float32)
    kn = jnp.asarray(rng.randn(n, h, 1, dk), jnp.float32)
    vn = jnp.asarray(rng.randn(n, h, 1, dk), jnp.float32)
    pos = 5
    gk, gv = write_beam_columns_kv(ck, cv, kn, vn, pos)
    ku = np.asarray(kn)[:, :, 0].reshape(b, km, h, dk).transpose(0, 2, 1, 3)
    vu = np.asarray(vn)[:, :, 0].reshape(b, km, h, dk).transpose(0, 2, 1, 3)
    np.testing.assert_array_equal(
        np.asarray(gk), np.asarray(ck.at[:, :, :, pos - 1, :].set(ku))
    )
    np.testing.assert_array_equal(
        np.asarray(gv), np.asarray(cv.at[:, :, :, pos - 1, :].set(vu))
    )
