#!/usr/bin/env python
"""Microbenchmark: per-step cost of writing one column into loop-carried beam
KV caches, across physical layouts — isolates the dynamic-update-slice cost
that dominates the ancestry-protocol beam decode (profile: ~1 ms per cache
leaf per step at the flagship LM shape, ~32 leaves => ~30 ms/step).

Each variant runs a fori_loop whose carry holds ``layers`` (k, v) cache pairs
at the flagship LM decode shape (B=32, H=8, K=10, Lc=102, dk=64, bf16) and
writes one column per pair per iteration; `+read` variants also consume the
cache with a q@K dot so the dataflow matches the real decode step (write must
not be dead-code-eliminated; read-after-write like the real attend).

Layouts:
  group  (B, H, K, Lc, dk)  column write = strided over B*H*K (8,128)-tiles
  time   (Lc, B, H, K, dk)  column write = one contiguous leading-dim block
  flat   (Lc, B*H*K*dk)     same, 2-D
  copy   control: force a full materialization of every leaf per step
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
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dk", type=int, default=64)
    ap.add_argument("--lc", type=int, default=102)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--variants",
                    default="group,group+read,time,time+read,flat,copy,"
                            "pallas,pallas+read")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    b, k, h, dk, lc, nl = (args.batch, args.beam, args.heads, args.dk,
                           args.lc, args.layers)
    n = b * k
    dt = jnp.dtype(args.dtype)
    leaf_mb = b * h * k * lc * dk * dt.itemsize / 2**20

    def run(variant):
        if variant.startswith("pallas"):
            # the RMW kernel needs Lc % 8 == 0 (ops/cache_update.py)
            shape = (b, h, k, -(-lc // 8) * 8, dk)
        elif variant.startswith("group"):
            shape = (b, h, k, lc, dk)
        elif variant.startswith("time"):
            shape = (lc, b, h, k, dk)
        elif variant.startswith("flat"):
            shape = (lc, b * h * k * dk)
        else:  # copy control
            shape = (b, h, k, lc, dk)
        caches = [
            (jnp.zeros(shape, dt), jnp.zeros(shape, dt)) for _ in range(nl)
        ]
        col = jnp.ones((b, h, k, dk), dt)  # this step's new column
        q = jnp.ones((b, h, k, dk), dt)

        def body(i, carry):
            caches, acc = carry
            out = []
            for ck, cv in caches:
                if variant == "copy":
                    ck = jnp.flip(ck, axis=3)
                    cv = jnp.flip(cv, axis=3)
                elif variant.startswith("pallas"):
                    from tailored_avsr_tpu.ops.cache_update import (
                        write_cache_column,
                    )
                    u = col * (1.0 + i)
                    ck = write_cache_column(ck, u, i % lc)
                    cv = write_cache_column(cv, u, i % lc)
                elif variant.startswith("group"):
                    u = col[:, :, :, None, :] * (1.0 + i)
                    ck = jax.lax.dynamic_update_slice(ck, u, (0, 0, 0, i % lc, 0))
                    cv = jax.lax.dynamic_update_slice(cv, u, (0, 0, 0, i % lc, 0))
                elif variant.startswith("time"):
                    u = col[None] * (1.0 + i)
                    ck = jax.lax.dynamic_update_slice(ck, u, (i % lc, 0, 0, 0, 0))
                    cv = jax.lax.dynamic_update_slice(cv, u, (i % lc, 0, 0, 0, 0))
                else:  # flat
                    u = col.reshape(1, -1) * (1.0 + i)
                    ck = jax.lax.dynamic_update_slice(ck, u, (i % lc, 0))
                    cv = jax.lax.dynamic_update_slice(cv, u, (i % lc, 0))
                if variant.endswith("+read") or variant == "copy":
                    if variant.startswith("time"):
                        # q (B,H,K,dk) x cache (Lc,B,H,K,dk) -> (B,H,K,Lc)
                        s = jax.lax.dot_general(
                            q, ck, (((3,), (4,)), ((0, 1, 2), (1, 2, 3)))
                        )
                        s = s + jax.lax.dot_general(
                            q, cv, (((3,), (4,)), ((0, 1, 2), (1, 2, 3)))
                        )
                    elif variant.startswith(("group", "pallas")):
                        # q (B,H,K,dk) x cache (B,H,K,Lc,dk) -> (B,H,K,Lc)
                        s = jax.lax.dot_general(
                            q, ck, (((3,), (4,)), ((0, 1, 2), (0, 1, 2)))
                        )
                        s = s + jax.lax.dot_general(
                            q, cv, (((3,), (4,)), ((0, 1, 2), (0, 1, 2)))
                        )
                    else:
                        s = (ck.sum() + cv.sum()).reshape(1, 1, 1, 1)
                    acc = acc + s.astype(jnp.float32).mean()
                out.append((ck, cv))
            return out, acc

        @jax.jit
        def loop(caches):
            return jax.lax.fori_loop(
                0, args.steps, body, (caches, jnp.zeros((), jnp.float32))
            )

        out = loop(caches)
        np.asarray(out[1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(caches)
            np.asarray(out[1])
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        per_step = ms / args.steps
        per_leaf = per_step / (2 * nl)
        gbps = 2 * nl * leaf_mb / 2**10 / (per_step / 1e3)
        print(json.dumps({
            "variant": variant, "ms_per_step": round(per_step, 3),
            "us_per_leaf": round(per_leaf * 1e3, 1),
            "leaf_mb": round(leaf_mb, 1),
            "cache_gb_touched_per_step_at": round(gbps, 1),
        }), flush=True)

    for v in args.variants.split(","):
        run(v)


if __name__ == "__main__":
    main()
