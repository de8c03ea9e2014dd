#!/usr/bin/env python
"""Micro-benchmark of beam-cache row-reorder formulations on device.

The beam loop permutes every KV-cache row once per step. This times each
candidate formulation on a realistic LM-cache pytree (layers x (K, V) of
(N, H, L, dk)) INSIDE a fori_loop (so loop-carry aliasing behaves like the
real beam), without paying the 15-minute beam-graph compile per data point.

Formulations:
  flat_gather      x[g_src] on the flattened N axis (the round-1 default)
  batched_gather   take_along_axis over (B, K, X) with an explicit batch dim
  onehot_einsum    per-utterance one-hot matmul (B,K,K) @ (B,K,X)
  onehot_vpu       masked sum over K with broadcasting (k reads, no matmul)
"""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--len", type=int, default=102, dest="length")
    ap.add_argument("--dk", type=int, default=64)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    b, k = args.batch, args.beam
    n = b * k
    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    cache = [
        (
            jnp.asarray(rng.randn(n, args.heads, args.length, args.dk), dtype),
            jnp.asarray(rng.randn(n, args.heads, args.length, args.dk), dtype),
        )
        for _ in range(args.layers)
    ]
    leaf_mb = cache[0][0].nbytes / 1e6
    total_gb = 2 * args.layers * cache[0][0].nbytes / 1e9
    # a fresh permutation per step, data-dependent so nothing constant-folds
    src_tab = jnp.asarray(rng.randint(0, k, (args.steps, b, k)), jnp.int32)

    def run(body):
        def loop(cache):
            def step(i, c):
                return body(c, src_tab[i])
            return jax.lax.fori_loop(0, args.steps, step, cache)

        f = jax.jit(loop)
        out = f(cache)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(cache)
            np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def flat_gather(c, src):
        g = (jnp.arange(b)[:, None] * k + src).reshape(n)
        return jax.tree_util.tree_map(lambda x: x[g], c)

    def batched_gather(c, src):
        def go(x):
            xr = x.reshape(b, k, -1)
            out = jnp.take_along_axis(xr, src[:, :, None], axis=1)
            return out.reshape(x.shape)
        return jax.tree_util.tree_map(go, c)

    def onehot_einsum(c, src):
        oh = jax.nn.one_hot(src, k, dtype=dtype)

        def go(x):
            xr = x.reshape(b, k, -1)
            return jnp.einsum("bij,bjx->bix", oh, xr).reshape(x.shape)
        return jax.tree_util.tree_map(go, c)

    def onehot_vpu(c, src):
        def go(x):
            xr = x.reshape(b, k, -1)
            out = jnp.zeros_like(xr)
            for j in range(k):
                sel = (src == j)[:, :, None]
                out = out + jnp.where(sel, xr[:, j][:, None, :], 0)
            return out.reshape(x.shape)
        return jax.tree_util.tree_map(go, c)

    results = {}
    for name, body in (
        ("flat_gather", flat_gather),
        ("batched_gather", batched_gather),
        ("onehot_einsum", onehot_einsum),
        ("onehot_vpu", onehot_vpu),
    ):
        dt = run(body)
        per_step_ms = dt / args.steps * 1e3
        results[name] = round(per_step_ms, 3)
        print(json.dumps({
            "formulation": name, "ms_per_step": round(per_step_ms, 3),
            "gb_per_s": round(2 * total_gb / (dt / args.steps), 1),
            "cache_gb": round(total_gb, 2), "leaf_mb": round(leaf_mb, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
