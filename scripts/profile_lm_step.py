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
    ap.add_argument("--variant", default="full", choices=["full", "append"])
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

    f = jax.jit(loop_full)
    out = f(cache0)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    with jax.profiler.trace(args.out):
        out = f(cache0)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    rank_ops(args.out, args.top)


if __name__ == "__main__":
    main()
