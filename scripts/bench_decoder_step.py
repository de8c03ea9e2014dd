"""Micro-bench: KV-cached decoder step cost inside a decode-style loop.

Measures the beam-search decoder path (score_step_cached + beam-reorder
gather) at joint-beam dims, with variants to isolate where the time goes:
  full   — step + cache-row gather (what beam_search does)
  nogather — step only (cache updated, no beam reorder)
"""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import time

import jax
import jax.numpy as jnp

from tailored_avsr_tpu.models.decoder import TransformerDecoder

B, K, T, V, D = 8, 10, 102, 41, 256
N = B * K
STEPS = 100


def main():
    dec = TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=4,
        linear_units=2048, num_blocks=6, dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    key = jax.random.PRNGKey(0)
    memory = jax.random.normal(key, (B, T, D))
    ys0 = jnp.full((N, T + 2), V - 1, jnp.int32).at[:, 0].set(V - 2)
    variables = dec.init(key, memory, None, ys0[:B, :8], jnp.full((B,), 8))

    mem_kv = dec.apply(
        variables, memory, method=lambda m, x: m.precompute_memory(x)
    )
    mem_kv = jax.tree_util.tree_map(lambda x: jnp.repeat(x, K, axis=0), mem_kv)

    def make_loop(reorder: str):
        @jax.jit
        def loop(ys):
            cache = dec.init_cache(N, T)

            def body(i, carry):
                ys, cache = carry
                logp, cache = dec.apply(
                    variables, mem_kv, None, ys, i + 1, cache,
                    method=lambda m, *a: m.score_step_cached(*a),
                )
                tok = jnp.argmax(logp, axis=-1)
                ys = jax.lax.dynamic_update_slice_in_dim(
                    ys, tok[:, None], i + 1, axis=1
                )
                src = (jnp.arange(N) + 1) % N
                if reorder == "gather":
                    cache = jax.tree_util.tree_map(lambda x: x[src], cache)
                elif reorder == "onehot":
                    perm = jax.nn.one_hot(src, N, dtype=cache[0][0].dtype)
                    cache = jax.tree_util.tree_map(
                        lambda x: (perm @ x.reshape(N, -1)).reshape(x.shape),
                        cache,
                    )
                return ys, cache

            ys, _ = jax.lax.fori_loop(0, STEPS, body, (ys0, cache))
            return ys

        return loop

    print("device:", jax.devices()[0])
    for name in ["gather", "onehot", "none"]:
        loop = make_loop(name)
        t0 = time.perf_counter()
        loop(ys0).block_until_ready()
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(5):
            ys = ys0.at[:, 0].set(V - 2 - (i % 2))
            ys.block_until_ready()
            t0 = time.perf_counter()
            loop(ys).block_until_ready()
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3
        print(
            f"{name:9s}: {ms:7.1f} ms / {STEPS} steps "
            f"({ms / STEPS * 1e3:6.1f} us/step)  [compile {compile_s:.1f} s]"
        )


if __name__ == "__main__":
    main()
