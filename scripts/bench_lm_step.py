#!/usr/bin/env python
"""Micro-benchmark of the folded-LM beam-step cost in isolation.

Runs ``TransformerLM.score_step_cached`` + the per-step beam reorder inside a
fori_loop at beam-search dims — the exact per-step LM work of the joint
decode — in seconds of compile time instead of the 15-minute beam graph.

Stages (cumulative):
  reorder    cache reorder only
  update     + per-layer K/V dynamic-update-slice
  trunk      + the full score_step_cached (attend + FFN + head)
  full       trunk + reorder (the real per-step pattern)
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
    ap.add_argument("--len", type=int, default=102, dest="length")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tailored_avsr_tpu.models.lm import TransformerLM
    from tailored_avsr_tpu.decode.beam_search import reorder_beam_rows

    b, k, L = args.batch, args.beam, args.length
    n = b * k
    dtype = jnp.dtype(args.dtype)
    vocab = 103
    lm = TransformerLM(vocab_size=vocab, att_unit=512, head=8, unit=2048,
                       layer=16)
    rng = np.random.RandomState(0)
    variables = lm.init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32),
        jnp.full((1,), 4, jnp.int32),
    )
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables
    )
    cache0 = lm.apply(
        variables, n, L, method=lambda m, *a: m.init_cache(*a, dtype=dtype)
    )
    ys = jnp.asarray(rng.randint(3, vocab - 1, (n, L)), jnp.int32)
    src_tab = jnp.asarray(rng.randint(0, k, (args.steps, b, k)), jnp.int32)

    def timed(loop_fn):
        f = jax.jit(loop_fn)
        out = f(cache0)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(cache0)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts) / args.steps * 1e3

    def reorder(c, src):
        return jax.tree_util.tree_map(lambda x: reorder_beam_rows(x, src), c)

    def loop_reorder(cache):
        def step(i, c):
            return reorder(c, src_tab[i])
        return jax.lax.fori_loop(0, args.steps, step, cache)

    def loop_trunk(cache):
        def step(i, carry):
            c, acc = carry
            logp, c = lm.apply(variables, ys, i + 1, c,
                               method="score_step_cached")
            return c, acc + logp[0, 0]
        c, acc = jax.lax.fori_loop(0, args.steps, step,
                                   (cache, jnp.zeros((), jnp.float32)))
        return c

    def loop_full(cache):
        def step(i, carry):
            c, acc = carry
            logp, c = lm.apply(variables, ys, i + 1, c,
                               method="score_step_cached")
            c = reorder(c, src_tab[i])
            return c, acc + logp[0, 0]
        c, acc = jax.lax.fori_loop(0, args.steps, step,
                                   (cache, jnp.zeros((), jnp.float32)))
        return c

    # measured dead ends at these dims (v5e-1, bf16, N=320): reordering at
    # the START of the body (lazy) 30.9 ms/step; folding the gather into each
    # layer's K/V update (fused per-leaf gather+DUS) 30.9 ms/step — both
    # WORSE than trunk-then-reorder (25.2 ms), so the loop-cut-point is not
    # the lever; the while-state copy-back is (see make_unrolled).
    def one_step(i, carry):
        c, acc = carry
        logp, c = lm.apply(variables, ys, i + 1, c,
                           method="score_step_cached")
        c = reorder(c, src_tab[i])
        return c, acc + logp[0, 0]

    def make_unrolled(u):
        # u steps per loop iteration: an XLA while-state leaf is a FIXED
        # buffer, and a gather cannot write into its own input buffer, so a
        # 1-step body ends every iteration with gather->temp->copy-back.
        # With u>=2 the final gather's input is already a temp, so its output
        # can be assigned directly to the state buffer — no copy.
        def loop(cache):
            def body(j, carry):
                for s in range(u):
                    carry = one_step(j * u + s, carry)
                return carry
            c, acc = jax.lax.fori_loop(0, args.steps // u, body,
                                       (cache, jnp.zeros((), jnp.float32)))
            return c
        return loop

    def loop_reorder2(cache):
        def body(j, c):
            c = reorder(c, src_tab[2 * j])
            return reorder(c, src_tab[2 * j + 1])
        return jax.lax.fori_loop(0, args.steps // 2, body, cache)

    from tailored_avsr_tpu.decode.beam_search import insert_permute_rows

    def append_step(i, carry):
        # cache-read-only scorer + fused insert+permute: ONE cache write pass
        # per leaf per step (no DUS materialization)
        c, acc = carry
        logp, new_kv = lm.apply(variables, ys, i + 1, c,
                                method="score_step_append")
        c = [
            (insert_permute_rows(ck, kn, src_tab[i], i + 1),
             insert_permute_rows(cv, vn, src_tab[i], i + 1))
            for (ck, cv), (kn, vn) in zip(c, new_kv)
        ]
        return c, acc + logp[0, 0]

    def make_append(u):
        def loop(cache):
            def body(j, carry):
                for s in range(u):
                    carry = append_step(j * u + s, carry)
                return carry
            c, acc = jax.lax.fori_loop(0, args.steps // u, body,
                                       (cache, jnp.zeros((), jnp.float32)))
            return c
        return loop

    variants = [("reorder", loop_reorder), ("reorder_u2", loop_reorder2),
                ("trunk", loop_trunk), ("full", loop_full),
                ("full_u2", make_unrolled(2)), ("full_u4", make_unrolled(4)),
                ("append", make_append(1)), ("append_u2", make_append(2))]
    for name, fn in variants:
        ms = timed(fn)
        print(json.dumps({"stage": name, "ms_per_step": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
