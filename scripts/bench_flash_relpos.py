"""Micro-bench: rel-pos attention three ways on the real chip.

1. pure XLA (matrix_ac + rel_shift bias, masked softmax)
2. flash kernel with XLA-materialized (B, H, T, T) bias streamed in
3. flash kernel with the Toeplitz term computed in-kernel (barrel shifter)
"""
import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import time

import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.attention import _masked_softmax, rel_shift
from tailored_avsr_tpu.ops.flash_attention import flash_attention, flash_attention_relpos


def xla_ref(q, k, v, qv, pos, mask):
    dk = q.shape[-1]
    bias = rel_shift(jnp.einsum("bhqd,hkd->bhqk", qv, pos))
    scores = (jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias) / dk ** 0.5
    attn = _masked_softmax(scores, mask).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def flash_xla_bias(q, k, v, qv, pos, mask):
    bias = rel_shift(jnp.einsum("bhqd,hkd->bhqk", qv, pos))
    return flash_attention(q, k, v, bias=bias, mask=mask)


def flash_fused(q, k, v, qv, pos, mask):
    return flash_attention_relpos(q, k, v, qv, pos, mask=mask)


def bench(fn, args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    # result-fetch timing (block_until_ready unreliable on the axon tunnel)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = jax.device_get(out[0, 0, 0, :1])
    return (time.perf_counter() - t0) / iters


def main():
    for (b, h, t, dk), dtype in [
        ((8, 4, 512, 64), jnp.float32),
        ((8, 4, 512, 64), jnp.bfloat16),
        ((128, 4, 128, 64), jnp.bfloat16),  # bench operating point shape
        ((16, 4, 256, 64), jnp.bfloat16),
    ]:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 5)
        q = jax.random.normal(ks[0], (b, h, t, dk), dtype)
        k = jax.random.normal(ks[1], (b, h, t, dk), dtype)
        v = jax.random.normal(ks[2], (b, h, t, dk), dtype)
        qv = jax.random.normal(ks[3], (b, h, t, dk), dtype)
        pos = (jax.random.normal(ks[4], (h, 2 * t - 1, dk), dtype) * 0.5)
        mask = jnp.arange(t)[None, :] < jnp.full((b,), t)[:, None]
        args = (q, k, v, qv, pos, mask)
        # correctness on-chip
        want = jax.jit(xla_ref)(*args)
        got = jax.jit(flash_fused)(*args)
        err = float(jnp.max(jnp.abs(want.astype(jnp.float32) - got.astype(jnp.float32))))
        r = {}
        for name, fn in [("xla", xla_ref), ("flash+xla_bias", flash_xla_bias),
                         ("flash_fused", flash_fused)]:
            r[name] = bench(fn, args)
        print(f"({b},{h},{t},{dk}) {jnp.dtype(dtype).name}: "
              + "  ".join(f"{n}={v*1e3:.2f}ms" for n, v in r.items())
              + f"  max_err={err:.2e}")


if __name__ == "__main__":
    main()
