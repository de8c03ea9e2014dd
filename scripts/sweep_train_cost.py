#!/usr/bin/env python
"""Train-step cost sweep on the flagship model (VERDICT r3 item 3): times the
PRODUCT train step (train/loop.make_train_step — donated state, bf16 mixed
precision) across batch sizes and remat on/off, reporting RTF, MFU, and the
818 h-corpus epoch projection per point. One JSON line per point; per-point
failures are isolated so an OOM at one batch doesn't kill the sweep."""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)

import argparse
import json
import time

import numpy as np


def run_point(tb, frames, use_remat, iters):
    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from __graft_entry__ import _build_flagship
    from tailored_avsr_tpu.train.loop import create_train_state, make_train_step

    on_tpu = jax.devices()[0].platform != "cpu"
    peak_tf = bench.peak_for(jax.devices()[0])
    rng = np.random.RandomState(7)
    tsamples = frames * 640
    batch = (
        jnp.asarray(rng.randn(tb, tsamples).astype(np.float32) * 0.1),
        jnp.full((tb,), tsamples, np.int32),
        jnp.asarray(rng.randn(tb, frames, 88, 88).astype(np.float32)),
        jnp.full((tb,), frames, np.int32),
        jnp.asarray(rng.randint(3, 30, (tb, 30)), np.int32),
        jnp.full((tb,), 30, np.int32),
    )
    tmodel = _build_flagship(tiny=False, use_flash=False)
    tvars = tmodel.init(
        {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)},
        *(x[:2] for x in batch),
    )
    tx = optax.adamw(1e-3)
    step = make_train_step(
        tmodel, tx, donate=True, remat=use_remat,
        compute_dtype=jnp.bfloat16 if on_tpu else None,
    )
    key = jax.random.PRNGKey(3)

    def fresh_state():
        copied = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True) if hasattr(x, "dtype") else x,
            tvars,
        )
        return create_train_state(copied, tx)

    state = fresh_state()
    flops = bench.graph_flops(step, state, batch, key)
    state, stats = step(state, batch, key)  # compile + step 1
    np.asarray(jax.tree_util.tree_leaves(stats)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, stats = step(state, batch, key)
        np.asarray(jax.tree_util.tree_leaves(stats)[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rtf = tb * tsamples / 16000.0 / dt
    line = {"batch": tb, "frames": frames, "remat": use_remat,
            "ms": round(dt * 1e3, 1), "rtf": round(rtf, 1),
            "epoch_hours_818h": round(818.0 / rtf, 2)}
    line.update(bench.perf_fields(flops, dt, peak_tf, tb))
    print(json.dumps(line), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--remat", default="0,1",
                    help="comma list of remat settings to A/B (0/1)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    import subprocess
    import sys

    # fresh process per point: compiled executables + donated buffers from
    # earlier points otherwise accumulate in HBM (the r4 beam-sweep lesson)
    for tb in [int(x) for x in args.batches.split(",")]:
        for rm in [x == "1" for x in args.remat.split(",")]:
            r = subprocess.run(
                [sys.executable, __file__, "--point",
                 f"{tb},{args.frames},{int(rm)},{args.iters}"],
                capture_output=True, text=True, timeout=3000,
            )
            emitted = [ln for ln in r.stdout.splitlines()
                       if ln.strip().startswith("{")]
            if emitted:
                for ln in emitted:
                    print(ln, flush=True)
            else:
                tail = (r.stdout + r.stderr).strip().splitlines()
                print(json.dumps({
                    "batch": tb, "remat": rm,
                    "error": (tail[-1][:200] if tail else "no output"),
                }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--point", default=None)
    known, _ = ap.parse_known_args()
    if known.point:
        tb, frames, rm, iters = (int(x) for x in known.point.split(","))
        run_point(tb, frames, bool(rm), iters)
    else:
        main()
