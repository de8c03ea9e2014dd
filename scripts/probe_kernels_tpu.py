#!/usr/bin/env python
"""On-device numerics probe: fused group-attend + paired cache-write kernels
vs their XLA oracles, COMPILED (not interpret mode).

This is the gate before any timed TPU run of the ancestry beam protocol —
the kernels are interpret-tested on CPU in CI, but Mosaic compilation is a
different code path. Kept small: each distinct shape/dtype is a separate
remote compile.

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

rng = np.random.RandomState(0)
cases = [
    (jnp.bfloat16, 0.05, (2, 4, 10, 104, 64), 52),   # flagship decoder layer
    (jnp.bfloat16, 0.05, (2, 8, 10, 104, 64), 90),   # flagship LM layer
    (jnp.float32, 1e-4, (1, 2, 3, 8, 64), 1),        # tiny + first-step edge
]
for dtype, tol, (b, h, km, lc, dk), pos in cases:
    k, v, q, k_new, v_new, anc = make_case(rng, b, h, km, lc, dk, pos, dtype=dtype)
    got = np.asarray(group_attend_anc(k, v, q, k_new, v_new, anc, pos), np.float64)
    want = ref_group_attend(k, v, q, k_new, v_new, anc, pos)
    err = np.max(np.abs(got - want) / (np.abs(want) + 1e-3))
    print(f"attend {dtype.__name__} ({b},{h},{km},{lc},{dk}) pos={pos}: "
          f"relerr={err:.2e}", flush=True)
    assert err < tol, "KERNEL MISMATCH"

from tailored_avsr_tpu.ops.cache_update import write_cache_columns_kv

b, h, k, lc, dk = 32, 8, 10, 104, 64
ck = jnp.asarray(rng.randn(b, h, k, lc, dk), jnp.bfloat16)
cv = jnp.asarray(rng.randn(b, h, k, lc, dk), jnp.bfloat16)
kc = jnp.asarray(rng.randn(b, h, k, dk), jnp.bfloat16)
vc = jnp.asarray(rng.randn(b, h, k, dk), jnp.bfloat16)
gk, gv = write_cache_columns_kv(ck, cv, kc, vc, 37)
np.testing.assert_array_equal(np.asarray(gk), np.asarray(ck.at[:, :, :, 37, :].set(kc)))
np.testing.assert_array_equal(np.asarray(gv), np.asarray(cv.at[:, :, :, 37, :].set(vc)))
print("kv-write bfloat16 ok", flush=True)
print("KERNEL PROBE OK", flush=True)
