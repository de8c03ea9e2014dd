#!/usr/bin/env python
"""On-device numerics probe for ALL fused Pallas kernels, COMPILED.

Round-4 postmortem (measurements/r4/mosaic_*.log, docs/DESIGN.md): the
round-3 probe compared the fused group-attend kernel against an f64 oracle
with a max-relerr metric whose denominator floors at 1e-3 — but the TPU MXU
multiplies f32/bf16 operands at bf16 INPUT precision by default, so
near-zero outputs legitimately show relerr ~O(1) under that metric. A plain
XLA matmul "fails" it at relerr 10.8 and jax's own reference pallas flash
attention at 1.9e3; against a bf16-input-rounded oracle the same kernels
agree to ~6e-5. There was no miscompile — round 3 benched the XLA fallback
for nothing.

The correct gate is RELATIVE: the fused kernel must not sit any further
from the f64 oracle than the XLA formulation it replaces, measured on the
same device with the same dtypes. Two checks per kernel case:
  1. rms_err(compiled) <= 3 * rms_err(interpret) + 2e-6   [vs f64 oracle]
     (interpret mode lowers the same kernel body through XLA on the same
     chip — same default matmul precision, no Mosaic)
  2. rms_diff(compiled, interpret) <= dtype tolerance       [direct A/B]
where rms_err(x) = max|x - oracle| / rms(oracle).

KV cache-column writes remain bit-exact (pure DMA, no MXU involved).

Usage: PYTHONPATH=/root/.axon_site python scripts/probe_kernels_tpu.py
"""
import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from tailored_avsr_tpu.ops.group_attend import group_attend_anc
from test_group_attend import make_case, ref_group_attend

FAILED = []


def rms_err(got, want):
    return float(
        np.max(np.abs(np.asarray(got, np.float64) - want))
        / max(np.sqrt(np.mean(want ** 2)), 1e-30)
    )


def gate(name, got_c, got_i, want, diff_tol):
    """Relative gate: compiled vs interpret(=XLA) vs the f64 oracle."""
    e_c, e_i = rms_err(got_c, want), rms_err(got_i, want)
    d = rms_err(got_c, np.asarray(got_i, np.float64))
    ok = (e_c <= 3.0 * e_i + 2e-6) and (d <= diff_tol)
    print(f"{name}: compiled={e_c:.2e} xla={e_i:.2e} diff={d:.2e} "
          f"{'OK' if ok else 'BAD'}", flush=True)
    if not ok:
        FAILED.append(name)


# ---------------- group attend (ancestry beam protocol) ----------------
rng = np.random.RandomState(0)
ga_cases = [
    (jnp.bfloat16, 6e-2, (2, 4, 10, 104, 64), 52),   # flagship decoder layer
    (jnp.bfloat16, 6e-2, (2, 8, 10, 104, 64), 90),   # flagship LM layer
    (jnp.float32, 1e-2, (1, 2, 3, 8, 64), 1),        # tiny + first-step edge
    (jnp.float32, 1e-2, (2, 3, 4, 16, 64), 9),
]
for dtype, dtol, (b, h, km, lc, dk), pos in ga_cases:
    k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos,
                                           dtype=dtype)
    got_c = group_attend_anc(k, v, q, k_new, v_new, anc, pos)
    got_i = group_attend_anc(k, v, q, k_new, v_new, anc, pos, interpret=True)
    want = ref_group_attend(k, v, q, k_new, v_new, anc, pos)
    gate(f"attend {dtype.__name__} ({b},{h},{km},{lc},{dk}) pos={pos}",
         got_c, got_i, want, dtol)

# phased-width narrowing (beam_search phase_widths): the K/V BlockSpecs
# shrink to width columns while anc stays full-width (Mosaic lane-dim
# divisibility; measurements/r4/fusedday/fphases96.log was the crash)
for dtype, dtol, (b, h, km, lc, dk), pos, w in [
    (jnp.bfloat16, 6e-2, (2, 4, 10, 104, 64), 25, 56),  # w % 128 != 0
    (jnp.float32, 1e-2, (2, 3, 4, 16, 64), 9, 8),
]:
    k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos,
                                           dtype=dtype)
    got_c = group_attend_anc(k, v, q, k_new, v_new, anc, pos, width=w)
    got_i = group_attend_anc(k, v, q, k_new, v_new, anc, pos, width=w,
                             interpret=True)
    want = ref_group_attend(k, v, q, k_new, v_new, anc, pos)
    gate(f"attend-width{w} {dtype.__name__} ({b},{h},{km},{lc},{dk}) "
         f"pos={pos}", got_c, got_i, want, dtol)

# ---------------- int8-quantized group attend (cache_dtype: int8) -------
from tailored_avsr_tpu.ops.group_attend import group_attend_anc_q
from tailored_avsr_tpu.ops.kv_quant import dequantize_cache, quantize_kv_column

for dtype, dtol, (b, h, km, lc, dk), pos, w in [
    (jnp.bfloat16, 6e-2, (2, 8, 10, 128, 64), 90, None),  # flagship LM layer
    (jnp.bfloat16, 6e-2, (2, 4, 10, 128, 64), 52, 64),    # narrowed width
]:
    k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos,
                                           dtype=dtype)
    kq, ks = quantize_kv_column(k)
    vq, vs = quantize_kv_column(v)
    got_c = group_attend_anc_q(kq, ks, vq, vs, q, k_new, v_new, anc, pos,
                               width=w)
    got_i = group_attend_anc_q(kq, ks, vq, vs, q, k_new, v_new, anc, pos,
                               width=w, interpret=True)
    want = ref_group_attend(dequantize_cache(kq, ks, jnp.float32),
                            dequantize_cache(vq, vs, jnp.float32),
                            q, k_new, v_new, anc, pos)
    gate(f"attend-q{'' if w is None else w} {dtype.__name__} "
         f"({b},{h},{km},{lc},{dk}) pos={pos}", got_c, got_i, want, dtol)

# int8 cache-column write (pure DMA at the 32-sublane tile)
from tailored_avsr_tpu.ops.cache_update import write_cache_columns_kv as _wkv

ck8 = jnp.asarray(rng.randint(-127, 128, (4, 8, 10, 128, 64)), jnp.int8)
cv8 = jnp.asarray(rng.randint(-127, 128, (4, 8, 10, 128, 64)), jnp.int8)
kc8 = jnp.asarray(rng.randint(-127, 128, (4, 8, 10, 64)), jnp.int8)
vc8 = jnp.asarray(rng.randint(-127, 128, (4, 8, 10, 64)), jnp.int8)
gk8, gv8 = _wkv(ck8, cv8, kc8, vc8, 37)
np.testing.assert_array_equal(
    np.asarray(gk8), np.asarray(ck8.at[:, :, :, 37, :].set(kc8)))
np.testing.assert_array_equal(
    np.asarray(gv8), np.asarray(cv8.at[:, :, :, 37, :].set(vc8)))
print("kv-write int8 exact ok", flush=True)

# ---------------- paired KV cache-column write (bit-exact DMA) ----------
from tailored_avsr_tpu.ops.cache_update import write_cache_columns_kv

b, h, k, lc, dk = 32, 8, 10, 104, 64
ck = jnp.asarray(rng.randn(b, h, k, lc, dk), jnp.bfloat16)
cv = jnp.asarray(rng.randn(b, h, k, lc, dk), jnp.bfloat16)
kc = jnp.asarray(rng.randn(b, h, k, dk), jnp.bfloat16)
vc = jnp.asarray(rng.randn(b, h, k, dk), jnp.bfloat16)
gk, gv = write_cache_columns_kv(ck, cv, kc, vc, 37)
np.testing.assert_array_equal(
    np.asarray(gk), np.asarray(ck.at[:, :, :, 37, :].set(kc)))
np.testing.assert_array_equal(
    np.asarray(gv), np.asarray(cv.at[:, :, :, 37, :].set(vc)))
print("kv-write bfloat16 exact ok", flush=True)

# ---------------- flash attention (encoder serving path) ----------------
from tailored_avsr_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_relpos,
)

for dtype, dtol in [(jnp.float32, 1e-2), (jnp.bfloat16, 6e-2)]:
    b, h, t, dk = 2, 4, 200, 64
    q = jnp.asarray(rng.randn(b, h, t, dk), dtype)
    k = jnp.asarray(rng.randn(b, h, t, dk), dtype)
    v = jnp.asarray(rng.randn(b, h, t, dk), dtype)
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([t, 137])[:, None])
    got_c = flash_attention(q, k, v, mask=mask)
    got_i = flash_attention(q, k, v, mask=mask, interpret=True)
    qf, kf, vf = (np.asarray(x, np.float64) for x in (q, k, v))
    s = np.einsum("bhtd,bhsd->bhts", qf, kf) / np.sqrt(dk)
    s = np.where(np.asarray(mask)[:, None, None, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhts,bhsd->bhtd", p, vf)
    # masked-out query rows compare within the valid region only
    wmask = np.asarray(mask)[:, None, :, None]
    gate(f"flash {np.dtype(dtype).name} ({b},{h},{t},{dk})",
         np.where(wmask, np.asarray(got_c, np.float64), 0.0),
         np.where(wmask, np.asarray(got_i, np.float64), 0.0),
         np.where(wmask, want, 0.0), dtol)

# rel-pos variant: compiled vs interpret only (the Toeplitz rel-shift oracle
# lives in tests/test_flash_attention.py; here the question is Mosaic-vs-XLA)
b, h, t, dk = 1, 4, 96, 32
q = jnp.asarray(rng.randn(b, h, t, dk), jnp.float32)
k = jnp.asarray(rng.randn(b, h, t, dk), jnp.float32)
v = jnp.asarray(rng.randn(b, h, t, dk), jnp.float32)
qr = jnp.asarray(rng.randn(b, h, t, dk), jnp.float32)
pos_tab = jnp.asarray(rng.randn(h, 2 * t - 1, dk), jnp.float32)
mask = jnp.asarray(np.arange(t)[None, :] < np.array([80])[:, None])
got_c = flash_attention_relpos(q, k, v, qr, pos_tab, mask)
got_i = flash_attention_relpos(q, k, v, qr, pos_tab, mask, interpret=True)
want_i = np.asarray(got_i, np.float64)
gate("flash-relpos float32 (1,4,96,32)", got_c, got_i, want_i, 1e-2)

# ---------------- fused CSGU (cgMLP gate) --------------------------------
from tailored_avsr_tpu.ops.fused_csgu import fused_csgu

b, t, u = 2, 19, 64
x = jnp.asarray(rng.randn(b, t, u), jnp.float32)
gamma = jnp.asarray(rng.randn(u // 2) * 0.1 + 1.0, jnp.float32)
beta = jnp.asarray(rng.randn(u // 2) * 0.1, jnp.float32)
cw = jnp.asarray(rng.randn(7, 1, u // 2) * 0.2, jnp.float32)
cb = jnp.asarray(rng.randn(u // 2) * 0.1, jnp.float32)
got_c = fused_csgu(x, gamma, beta, cw, cb)
got_i = fused_csgu(x, gamma, beta, cw, cb, interpret=True)
xf = np.asarray(x, np.float64)
x_r, x_g = xf[..., : u // 2], xf[..., u // 2:]
ln = (x_g - x_g.mean(-1, keepdims=True)) / np.sqrt(
    x_g.var(-1, keepdims=True) + 1e-6) * np.asarray(gamma, np.float64) + (
    np.asarray(beta, np.float64))
wnp = np.asarray(cw, np.float64)[:, 0, :]  # (k, C)
conv = np.zeros_like(ln)
half = wnp.shape[0] // 2
for j in range(wnp.shape[0]):
    sh = j - half
    src = np.roll(ln, -sh, axis=1)
    if sh > 0:
        src[:, -sh:, :] = 0
    elif sh < 0:
        src[:, :-sh, :] = 0
    conv += src * wnp[j]
want = x_r * (conv + np.asarray(cb, np.float64))
gate(f"csgu float32 ({b},{t},{u})", got_c, got_i, want, 1e-2)

if FAILED:
    print("KERNEL PROBE FAILED:", ", ".join(FAILED), flush=True)
    sys.exit(1)
print("KERNEL PROBE OK", flush=True)
