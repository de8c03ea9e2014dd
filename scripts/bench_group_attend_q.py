#!/usr/bin/env python
"""Isolated A/B of the fused group-attend kernels: bf16 cache vs int8 cache
at the flagship LM decode shape. The full-graph sweep measured cache_dtype
int8 at 205.9x RT vs 279x exact (measurements/r4/int8day/i96.log) — this
separates "the int8 kernel itself is slower than its halved DMA should
allow" (compute/upcast-bound) from "the slowdown lives elsewhere in the
beam graph"."""

import _pathfix  # noqa: F401

import argparse
import json
import time

import numpy as np


def timeit(fn, iters=30):
    out = fn()
    np.asarray(out)  # honest fetch once to sync
    # device-only timing: one fetch at the end of each burst of 5
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn()
        np.asarray(out)
        times.append((time.perf_counter() - t0) / 5)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--lc", type=int, default=128)
    ap.add_argument("--dk", type=int, default=64)
    ap.add_argument("--widths", default=",32,64",
                    help="comma list; empty entry = full width")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tailored_avsr_tpu.ops.group_attend import (
        group_attend_anc,
        group_attend_anc_q,
    )
    from tailored_avsr_tpu.ops.kv_quant import quantize_kv_column

    b, h, km, lc, dk = args.batch, args.heads, args.beam, args.lc, args.dk
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(b, h, km, lc, dk), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, km, lc, dk), jnp.bfloat16)
    q = jnp.asarray(rng.randn(b, h, km, dk), jnp.bfloat16)
    k_new = jnp.asarray(rng.randn(b, h, km, dk), jnp.bfloat16)
    v_new = jnp.asarray(rng.randn(b, h, km, dk), jnp.bfloat16)
    anc = jnp.asarray(rng.randint(0, km, (b, km, lc)), jnp.int32)
    pos = jnp.asarray(90, jnp.int32)
    kq, ks = quantize_kv_column(k)
    vq, vs = quantize_kv_column(v)
    kq, ks, vq, vs = map(jax.device_put, (kq, ks, vq, vs))

    for wtok in args.widths.split(","):
        w = int(wtok) if wtok else None
        wq = w if w is None else max(32, (w // 32) * 32)
        f_bf = jax.jit(lambda: group_attend_anc(
            k, v, q, k_new, v_new, anc, pos, width=w))
        f_q = jax.jit(lambda: group_attend_anc_q(
            kq, ks, vq, vs, q, k_new, v_new, anc, pos, width=wq))
        dt_bf = timeit(f_bf)
        dt_q = timeit(f_q)
        bytes_bf = b * h * km * (w or lc) * dk * 2 * 2
        bytes_q = b * h * km * (wq or lc) * dk * 2 + b * h * km * lc * 4 * 2
        print(json.dumps({
            "width": w, "bf16_ms": round(dt_bf * 1e3, 3),
            "int8_ms": round(dt_q * 1e3, 3),
            "bf16_gbps": round(bytes_bf / dt_bf / 1e9, 1),
            "int8_gbps": round(bytes_q / dt_q / 1e9, 1),
            "speedup": round(dt_bf / dt_q, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
