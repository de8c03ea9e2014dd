"""Fused ancestry-group-attend kernel (ops/group_attend.py): parity with the
XLA formulation in MultiHeadedAttention.attend_kv_anc (interpret mode on CPU;
the real kernel runs inside the TPU beam decode)."""

import numpy as np
import jax.numpy as jnp

from tailored_avsr_tpu.ops.group_attend import group_attend_anc
from tailored_avsr_tpu.ops.masking import MASK_MIN


def ref_group_attend(k, v, q, k_new, v_new, anc, pos):
    """NumPy twin of the attend_kv_anc group math (f64 for a stable oracle)."""
    b, h, km, lc, dk = k.shape
    f = np.float64
    k, v, q, k_new, v_new = (np.asarray(x, f) for x in (k, v, q, k_new, v_new))
    scale = 1.0 / np.sqrt(dk)
    s = np.einsum("bhid,bhjtd->bhijt", q, k) * scale
    valid = (
        np.asarray(anc)[:, None, :, None, :]
        == np.arange(km)[None, None, None, :, None]
    ) & (np.arange(lc) < pos - 1)[None, None, None, None, :]
    s = np.where(valid, s, MASK_MIN)
    s_new = np.einsum("bhid,bhid->bhi", q, k_new) * scale
    m = np.maximum(s.max(axis=(3, 4)), s_new)
    p = np.exp(s - m[..., None, None]) * valid
    p_new = np.exp(s_new - m)
    lsum = p.sum(axis=(3, 4)) + p_new
    out = np.einsum("bhijt,bhjtd->bhid", p / lsum[..., None, None], v)
    return out + (p_new / lsum)[..., None] * v_new


def make_case(rng, b, h, km, lc, dk, pos, dtype=jnp.float32):
    k = jnp.asarray(rng.randn(b, h, km, lc, dk), dtype)
    v = jnp.asarray(rng.randn(b, h, km, lc, dk), dtype)
    q = jnp.asarray(rng.randn(b, h, km, dk), dtype)
    k_new = jnp.asarray(rng.randn(b, h, km, dk), dtype)
    v_new = jnp.asarray(rng.randn(b, h, km, dk), dtype)
    # live columns carry a real slot id; everything else is poisoned with -1
    anc = np.full((b, km, lc), -1, np.int32)
    anc[:, :, : max(pos - 1, 0)] = rng.randint(0, km, (b, km, max(pos - 1, 0)))
    return k, v, q, k_new, v_new, jnp.asarray(anc)


def test_matches_reference_over_positions():
    rng = np.random.RandomState(0)
    b, h, km, lc, dk = 2, 3, 4, 16, 8
    for pos in [1, 2, 7, 15, 16]:
        k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos)
        got = group_attend_anc(k, v, q, k_new, v_new, anc, pos, interpret=True)
        want = ref_group_attend(k, v, q, k_new, v_new, anc, pos)
        assert got.shape == (b, h, km, dk) and got.dtype == v.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float64), want, rtol=1e-5, atol=1e-6
        )


def test_first_step_attends_only_self():
    """pos=1: no live history — the output must be exactly v_new."""
    rng = np.random.RandomState(1)
    k, v, q, k_new, v_new, anc = make_case(rng, 1, 2, 3, 8, 4, pos=1)
    got = group_attend_anc(k, v, q, k_new, v_new, anc, 1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(v_new), rtol=1e-6, atol=1e-6
    )


def test_bf16_inputs():
    rng = np.random.RandomState(2)
    b, h, km, lc, dk = 2, 2, 3, 24, 16
    pos = 13
    k, v, q, k_new, v_new, anc = make_case(
        rng, b, h, km, lc, dk, pos, dtype=jnp.bfloat16
    )
    got = group_attend_anc(k, v, q, k_new, v_new, anc, pos, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = ref_group_attend(k, v, q, k_new, v_new, anc, pos)
    np.testing.assert_allclose(
        np.asarray(got, np.float64), want, rtol=0.05, atol=0.05
    )


def test_flagship_shape_smoke():
    """The exact flagship decode shapes (decoder layer + LM layer)."""
    rng = np.random.RandomState(3)
    for h in (4, 8):  # decoder heads / LM heads
        k, v, q, k_new, v_new, anc = make_case(rng, 2, h, 10, 104, 64, pos=52)
        got = group_attend_anc(k, v, q, k_new, v_new, anc, 52, interpret=True)
        want = ref_group_attend(k, v, q, k_new, v_new, anc, 52)
        np.testing.assert_allclose(
            np.asarray(got, np.float64), want, rtol=1e-4, atol=1e-5
        )


def test_width_narrows_blockspec_exactly():
    """A static width w >= pos-1 matches full Lc to f32 reduction-order noise
    — the narrowed BlockSpec only drops columns that are masked dead anyway
    (dropping them regroups the live terms in the sums, so agreement is
    ulp-level, not bit-level), and it matches the f64 oracle as tightly as
    the full-width kernel does."""
    rng = np.random.RandomState(4)
    b, h, km, lc, dk = 2, 2, 4, 32, 8
    pos = 9  # live columns 0..7 -> any width >= 8 covers them
    k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos)
    want = ref_group_attend(k, v, q, k_new, v_new, anc, pos)
    for w in (8, 16, 24):
        got = group_attend_anc(
            k, v, q, k_new, v_new, anc, pos, width=w, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float64), want, rtol=1e-5, atol=1e-6
        )
    try:
        group_attend_anc(k, v, q, k_new, v_new, anc, pos, width=12, interpret=True)
    except ValueError as e:
        assert "multiple of 8" in str(e)
    else:
        raise AssertionError("width=12 should be rejected")


def test_long_lc_head_blocked_grid():
    """Lc big enough to force hb < H (the long-T serving shape guard):
    per-(batch, head-block) grid steps must agree with the oracle."""
    rng = np.random.RandomState(5)
    b, h, km, lc, dk = 1, 4, 10, 512, 64  # leaf ~10 MB f32 -> hb = 1
    pos = 300
    k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos)
    got = group_attend_anc(k, v, q, k_new, v_new, anc, pos, interpret=True)
    want = ref_group_attend(k, v, q, k_new, v_new, anc, pos)
    np.testing.assert_allclose(
        np.asarray(got, np.float64), want, rtol=1e-4, atol=1e-5
    )


def test_edge_shapes_beam1_minlc_wide_dk():
    """Pre-TPU edge hardening: beam 1 (single-slot groups, K*Lc sublane
    collapse degenerates), minimal 8-column cache, and dk=128 (full lane
    width) must all match the oracle."""
    rng = np.random.RandomState(6)
    cases = [
        (1, 2, 1, 8, 16, 5),    # beam 1
        (3, 1, 2, 8, 8, 8),     # minimal Lc, pos at the last column
        (2, 2, 3, 16, 128, 9),  # dk = full lane width
        (2, 2, 10, 16, 64, 16), # pos == lc (overshoot step's attend)
    ]
    for b, h, km, lc, dk, pos in cases:
        k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos)
        got = group_attend_anc(k, v, q, k_new, v_new, anc, pos, interpret=True)
        want = ref_group_attend(k, v, q, k_new, v_new, anc, pos)
        np.testing.assert_allclose(
            np.asarray(got, np.float64), want, rtol=1e-4, atol=1e-5,
            err_msg=f"case {(b, h, km, lc, dk, pos)}",
        )


def quantize_case(k, v):
    """Per-column int8 quantization of a test case's cache sides."""
    from tailored_avsr_tpu.ops.kv_quant import quantize_kv_column

    kq, ks = quantize_kv_column(k)
    vq, vs = quantize_kv_column(v)
    return (kq, ks), (vq, vs)


def test_quantized_kernel_matches_dequantized_oracle():
    """group_attend_anc_q over an int8 cache == the f64 oracle over the
    DEQUANTIZED cache (bit-for-bit the same inputs — the quantization error
    itself is not under test here, the kernel's scale folding is)."""
    from tailored_avsr_tpu.ops.group_attend import group_attend_anc_q
    from tailored_avsr_tpu.ops.kv_quant import dequantize_cache

    rng = np.random.RandomState(7)
    for (b, h, km, lc, dk), pos, w in [
        ((2, 3, 4, 32, 8), 9, None),
        ((2, 2, 3, 64, 16), 17, 32),  # narrowed width, 32-tile
        ((1, 2, 3, 32, 8), 1, None),  # first step: self only
    ]:
        k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos)
        (kq, ks), (vq, vs) = quantize_case(k, v)
        got = group_attend_anc_q(
            kq, ks, vq, vs, q, k_new, v_new, anc, pos, width=w,
            interpret=True,
        )
        kd = dequantize_cache(kq, ks, jnp.float32)
        vd = dequantize_cache(vq, vs, jnp.float32)
        want = ref_group_attend(kd, vd, q, k_new, v_new, anc, pos)
        np.testing.assert_allclose(
            np.asarray(got, np.float64), want, rtol=2e-4, atol=2e-5
        )


def test_quantization_error_bound():
    """Per-column symmetric int8: dequantized values within 0.5 LSB of the
    column max — the quality contract cache_dtype:int8 rests on."""
    from tailored_avsr_tpu.ops.kv_quant import dequantize_cache, quantize_kv_column

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 4, 3, 16, 8) * 3.0, jnp.float32)
    q, s = quantize_kv_column(x)
    back = dequantize_cache(q, s, jnp.float32)
    colmax = np.max(np.abs(np.asarray(x)), axis=-1)
    err = np.max(np.abs(np.asarray(back) - np.asarray(x)), axis=-1)
    assert np.all(err <= colmax / 127.0 * 0.5 + 1e-7)
    # zero columns round-trip to exact zeros
    x0 = jnp.zeros((1, 1, 1, 8, 4), jnp.float32)
    q0, s0 = quantize_kv_column(x0)
    np.testing.assert_array_equal(np.asarray(dequantize_cache(q0, s0, jnp.float32)), 0.0)


def test_attend_kv_anc_quantized_fused_matches_xla():
    """The full attend entry point (ops/attention.attend_kv_anc) with tuple
    cache sides: fused interpret path vs the XLA dequantize fallback."""
    import jax

    from tailored_avsr_tpu.ops.attention import MultiHeadedAttention

    rng = np.random.RandomState(11)
    b, h, km, lc, dk = 2, 2, 3, 32, 8
    d = h * dk
    pos = 9
    mha = MultiHeadedAttention(h, 0.0, d)
    x = jnp.asarray(rng.randn(b * km, 1, d), jnp.float32)
    variables = mha.init(jax.random.PRNGKey(0), x, x, x, None)
    k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos)
    kq, vq = quantize_case(k, v)
    qh = q.transpose(0, 2, 1, 3).reshape(b * km, h, 1, dk)
    kn = k_new.transpose(0, 2, 1, 3).reshape(b * km, h, 1, dk)
    vn = v_new.transpose(0, 2, 1, 3).reshape(b * km, h, 1, dk)
    anc_n = np.asarray(anc).reshape(b * km, lc)
    got_f = mha.apply(
        variables, kq, vq, kn, vn, jnp.asarray(anc_n), pos, km, qh,
        method=lambda m, *a: m.attend_kv_anc(*a, fused=True),
    )
    got_x = mha.apply(
        variables, kq, vq, kn, vn, jnp.asarray(anc_n), pos, km, qh,
        method=lambda m, *a: m.attend_kv_anc(*a, fused=False),
    )
    np.testing.assert_allclose(
        np.asarray(got_f), np.asarray(got_x), rtol=2e-4, atol=2e-5
    )
