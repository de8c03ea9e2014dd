#!/usr/bin/env python
"""Capture a device profile of the jitted beam decode and print the top ops.

Writes a jax.profiler trace, then parses the trace-events JSON itself (no
tensorboard needed) and aggregates device-op durations by fused-op name, so
the per-step cost of the beam loop's cache gathers / attention / DP shows up
as a ranked table.
"""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import argparse
import glob
import gzip
import json
import os
from collections import defaultdict

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--lm", action="store_true")
    ap.add_argument("--protocol", default="anc",
                    help="beam KV-cache protocol: anc | append")
    ap.add_argument("--unroll", type=int, default=2)
    ap.add_argument("--fused", default="auto", choices=["auto", "0", "1"],
                    help="group-attend kernel: auto (TPU default) | 0 XLA | 1 Pallas")
    ap.add_argument("--out", default="/tmp/beam_profile")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    from tailored_avsr_tpu.inference import Speech2Text
    from tailored_avsr_tpu.utils.config import load_config

    on_tpu = jax.devices()[0].platform != "cpu"
    b, frames = args.batch, args.frames
    samples = frames * 640
    rng = np.random.RandomState(0)
    data = {
        "audio": (rng.randn(b, samples) * 0.1).astype(np.float32),
        "audio_lengths": np.full((b,), samples, np.int32),
        "video": rng.randn(b, frames, 88, 88).astype(np.float32),
        "video_lengths": np.full((b,), frames, np.int32),
        "text": np.ones((b, 8), np.int32),
        "text_lengths": np.full((b,), 8, np.int32),
    }

    cfg = load_config("configs/AVSR/tailored_transformer+ctc_spanish.yaml")
    lm_cfg = load_config("configs/LM/lm-spanish.yaml") if args.lm else None
    if on_tpu:
        cfg.dtype = "bfloat16"
        cfg.encoder_conf = dict(cfg.encoder_conf, use_flash=True)
    cfg.inference_conf = dict(
        cfg.inference_conf, beam_size=args.beam, ctc_weight=0.1,
        lm_weight=0.4 if args.lm else 0.0, early_exit=False,
        cache_protocol=args.protocol, unroll=args.unroll,
    )
    if args.fused != "auto":
        cfg.inference_conf["fused_group_attend"] = args.fused == "1"
    s2t = Speech2Text(cfg, lm_config=lm_cfg)
    d = s2t.device_put_batch(dict(data))
    out = s2t._decode_arrays(d)  # compile + warmup
    np.asarray(jax.tree_util.tree_leaves(out)[0])

    with jax.profiler.trace(args.out):
        out = s2t._decode_arrays(d)
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    # ---- parse the trace ----------------------------------------------------
    paths = sorted(
        glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace written under", args.out)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    # device-lane complete events, grouped by op name
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower() or "XLA" in name
    }
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))  # microseconds
        dur_by_name[name] += dur
        cnt_by_name[name] += 1
        total += dur
    rows = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[: args.top]
    print(f"# device pids: {sorted(device_pids)} "
          f"({ {pid: pid_names[pid] for pid in device_pids} })")
    print(f"# total device-op time: {total/1e3:.1f} ms")
    for name, dur in rows:
        print(f"{dur/1e3:9.2f} ms  x{cnt_by_name[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
