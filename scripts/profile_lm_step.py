#!/usr/bin/env python
"""Profile the folded-LM beam-step micro-loop (fast compile) and rank ops."""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import argparse
import glob
import gzip
import json
import os
from collections import defaultdict

import numpy as np


def rank_ops(trace_dir, top):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {p for p, nm in pid_names.items() if "TPU" in nm}
    dur, cnt = defaultdict(float), defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur[ev.get("name", "?")] += float(ev.get("dur", 0.0))
        cnt[ev.get("name", "?")] += 1
        total += float(ev.get("dur", 0.0))
    print(f"# total device-op time: {total/1e3:.1f} ms")
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d/1e3:9.2f} ms  x{cnt[name]:<6} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--len", type=int, default=102, dest="length")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--out", default="/tmp/lm_step_profile")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--variant", default="full",
                    choices=["full", "append", "anc"])
    ap.add_argument("--fused", type=int, default=1,
                    help="anc variant: 1 = Pallas group attend, 0 = XLA")
    ap.add_argument("--width", type=int, default=0,
                    help="anc variant: static attend width (0 = full Lc)")
    ap.add_argument("--unroll", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tailored_avsr_tpu.models.lm import TransformerLM
    from tailored_avsr_tpu.decode.beam_search import reorder_beam_rows

    b, k, L = args.batch, args.beam, args.length
    n = b * k
    dtype = jnp.bfloat16
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

    from tailored_avsr_tpu.decode.beam_search import insert_permute_rows

    def step_full(i, carry):
        c, acc = carry
        logp, c = lm.apply(variables, ys, i + 1, c,
                           method="score_step_cached")
        c = jax.tree_util.tree_map(
            lambda x: reorder_beam_rows(x, src_tab[i]), c
        )
        return c, acc + logp[0, 0]

    def step_append(i, carry):
        c, acc = carry
        logp, new_kv = lm.apply(variables, ys, i + 1, c,
                                method="score_step_append")
        c = [
            (insert_permute_rows(ck, kn, src_tab[i], i + 1),
             insert_permute_rows(cv, vn, src_tab[i], i + 1))
            for (ck, cv), (kn, vn) in zip(c, new_kv)
        ]
        return c, acc + logp[0, 0]

    # production serving path: ancestry protocol + (fused|XLA) group attend
    # + paired cache-column writes (mirrors inference.py's att_fn/gather)
    cache_anc = lm.apply(
        variables, b, k, L,
        method=lambda m, *a: m.init_cache_group(*a, dtype=dtype),
    )
    anc0 = jnp.zeros((n, cache_anc[0][0].shape[3]), jnp.int32)

    from tailored_avsr_tpu.decode.beam_search import (
        update_ancestry,
        write_beam_columns_kv,
    )

    def step_anc(i, carry):
        c, anc, acc = carry
        logp, new_kv = lm.apply(
            variables, ys, i + 1, c, anc, k, args.width or None,
            method=lambda m, *a: m.score_step_anc(
                *a, fused=bool(args.fused)
            ),
        )
        c = [
            (write_beam_columns_kv(ck, cv, kn.astype(dtype),
                                   vn.astype(dtype), i + 1))
            for (ck, cv), (kn, vn) in zip(c, new_kv)
        ]
        g_src = (jnp.arange(n) // k) * k + src_tab[i].reshape(-1)
        anc = update_ancestry(anc, g_src, src_tab[i].reshape(-1, k), i + 1)
        return c, anc, acc + logp[0, 0]

    def loop_anc(cache):
        u = args.unroll

        def body(j, carry):
            for s in range(u):
                carry = step_anc(j * u + s, carry)
            return carry
        c, anc, acc = jax.lax.fori_loop(
            0, args.steps // u, body,
            (cache, anc0, jnp.zeros((), jnp.float32)))
        return c

    def loop_full(cache):
        step = step_append if args.variant == "append" else step_full
        u = args.unroll

        def body(j, carry):
            for s in range(u):
                carry = step(j * u + s, carry)
            return carry
        c, acc = jax.lax.fori_loop(0, args.steps // u, body,
                                   (cache, jnp.zeros((), jnp.float32)))
        return c

    if args.variant == "anc":
        f, arg = jax.jit(loop_anc), cache_anc
    else:
        f, arg = jax.jit(loop_full), cache0
    out = f(arg)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    import time

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(arg)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"# {args.variant} loop: {dt*1e3:.1f} ms total, "
          f"{dt*1e3/args.steps:.3f} ms/step "
          f"(b={b} k={k} L={L} fused={args.fused} width={args.width})",
          flush=True)
    with jax.profiler.trace(args.out):
        out = f(arg)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    rank_ops(args.out, args.top)


if __name__ == "__main__":
    main()
