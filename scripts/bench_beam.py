#!/usr/bin/env python
"""RTF-vs-batch curve for the WER-parity decode path: joint CTC/attention
beam search + Transformer-LM shallow fusion on the flagship tailored AVSR
model (the configuration the reference scores with,
ref src/inference/avsr_inference.py:277-309).

Device-resident timing (inputs staged with device_put_batch, results fetched
to host each iteration). Two operating points per (batch, beam):

- ``full``: early_exit off — the loop runs all T steps (worst case, matches
  the round-1 measurement protocol);
- ``realistic``: early_exit on with minlenratio 0.6 — hypotheses cannot
  finish before 60% of the frames (a 4 s utterance is ~60 chars at 25 fps
  encoder rate), after which the exact upper-bound termination stops the
  loop; with random weights this brackets trained-model behavior, where the
  text ends well before one-token-per-frame.

Usage: PYTHONPATH=/root/.axon_site python scripts/bench_beam.py [--quick]
Prints one JSON line per configuration plus a summary table.
"""

from __future__ import annotations

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import argparse
import json
import sys
import time

import numpy as np


def make_batch(batch: int, frames: int):
    rng = np.random.RandomState(0)
    samples = frames * 640
    return {
        "audio": rng.randn(batch, samples).astype(np.float32) * 0.1,
        "audio_lengths": np.full((batch,), samples, np.int32),
        "video": rng.randn(batch, frames, 88, 88).astype(np.float32),
        "video_lengths": np.full((batch,), frames, np.int32),
        "text": np.ones((batch, 8), np.int32),
        "text_lengths": np.full((batch,), 8, np.int32),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="batch 8 only")
    parser.add_argument("--frames", type=int, default=100)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--beams", type=int, nargs="+", default=[10, 30])
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[8, 32, 64, 128])
    args = parser.parse_args()

    import jax

    from tailored_avsr_tpu.inference import Speech2Text
    from tailored_avsr_tpu.utils.config import load_config

    on_tpu = jax.devices()[0].platform != "cpu"
    frames = args.frames
    audio_seconds_per_utt = frames * 640 / 16000.0

    results = []
    batches = [8] if args.quick else args.batches
    for beam in args.beams:
        for mode, inf_over in (
            ("full", {"early_exit": False, "minlenratio": 0.0}),
            ("realistic", {"early_exit": True, "minlenratio": 0.6}),
        ):
            cfg = load_config("configs/AVSR/tailored_transformer+ctc_spanish.yaml")
            lm_cfg = load_config("configs/LM/lm-spanish.yaml")
            if on_tpu:
                cfg.dtype = "bfloat16"
                cfg.encoder_conf = dict(cfg.encoder_conf, use_flash=True)
            cfg.inference_conf = dict(
                cfg.inference_conf,
                beam_size=beam,
                ctc_weight=0.1,
                lm_weight=0.4,
                batch_size=0,
                **inf_over,
            )
            s2t = Speech2Text(cfg, lm_config=lm_cfg)
            for batch in batches:
                data = make_batch(batch, frames)
                data = s2t.device_put_batch(data)
                # warmup/compile (tunnel can drop transiently; retry)
                for attempt in range(3):
                    try:
                        s2t._decode_arrays(data)
                        break
                    except Exception:
                        if attempt == 2:
                            raise
                        time.sleep(10)
                times = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    s2t._decode_arrays(data)  # np.asarray inside = honest fetch
                    times.append(time.perf_counter() - t0)
                dt = min(times)
                rtf = batch * audio_seconds_per_utt / dt
                row = {
                    "metric": f"avsr_beam{beam}_lm_rtf_{mode}",
                    "batch": batch,
                    "beam": beam,
                    "mode": mode,
                    "ms_per_batch": round(dt * 1e3, 1),
                    "value": round(rtf, 1),
                    "unit": "x_realtime_per_chip",
                }
                results.append(row)
                print(json.dumps(row), flush=True)
            del s2t  # free the jit cache before the next config

    print("\n| beam | mode | " + " | ".join(f"b={b}" for b in batches) + " |")
    print("|---|---|" + "---|" * len(batches))
    for beam in args.beams:
        for mode in ("full", "realistic"):
            vals = [
                r["value"]
                for r in results
                if r["beam"] == beam and r["mode"] == mode
            ]
            print(
                f"| {beam} | {mode} | "
                + " | ".join(f"{v}x" for v in vals)
                + " |"
            )
    return results


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
