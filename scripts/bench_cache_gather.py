"""Micro-bench: beam-reorder gather cost over decoder KV caches.

Isolates the per-step cache-row gather of the beam search at joint-beam dims
(6 layers x (K, V) x (N, H, Lc, dk)) across layouts and dtypes.
"""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import time

import jax
import jax.numpy as jnp

B, K, T, D, H, L = 8, 10, 102, 256, 4, 6
N, DK = B * K, D // H
STEPS = 100


def bench(name, cache):
    @jax.jit
    def loop(cache, seed):
        def body(i, cache):
            # data-dependent permutation: defeats any loop/rotation folding
            leaf0 = jax.tree_util.tree_leaves(cache)[0]
            src = jnp.argsort(leaf0.reshape(N, -1)[:, 0].astype(jnp.float32) + seed)
            return jax.tree_util.tree_map(lambda x: x[src], cache)

        return jax.lax.fori_loop(0, STEPS, body, cache)

    out = loop(cache, 0)
    jax.block_until_ready(out)
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(cache, i))
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(cache))
    gbps = nbytes * 2 * STEPS / (min(times) * 1e9)
    print(f"{name:16s}: {ms:7.1f} ms / {STEPS} steps "
          f"({ms / STEPS * 1e3:6.1f} us/step, {gbps:5.0f} GB/s eff)")


def main():
    print("device:", jax.devices()[0])
    key = jax.random.PRNGKey(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        leaves = [
            (
                jax.random.normal(key, (N, H, T, DK), dtype),
                jax.random.normal(key, (N, H, T, DK), dtype),
            )
            for _ in range(L)
        ]
        stacked = (
            jax.random.normal(key, (N, L, H, T, DK), dtype),
            jax.random.normal(key, (N, L, H, T, DK), dtype),
        )
        flat = (jax.random.normal(key, (N, L * H * T * DK), dtype),)
        bench(f"12-leaf {dtype.__name__}", leaves)
        bench(f"stacked {dtype.__name__}", stacked)
        bench(f"flat    {dtype.__name__}", flat)


if __name__ == "__main__":
    main()
