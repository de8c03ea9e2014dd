#!/usr/bin/env python
"""AOT memory analysis of the jitted beam-decode graph: compiles (never runs)
the flagship beam+LM decode at the given batches and prints XLA's buffer
accounting — what actually OOMs at batch 128 (measurements/r4/fusedday/
fsweep.log) instead of guessing. Compile-only, so it works even for points
that cannot execute on the chip."""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="96,128")
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--fused", default="1", choices=["0", "1"])
    ap.add_argument("--phase-widths", default="0.25,0.5,1.0")
    args = ap.parse_args()

    import jax

    from tailored_avsr_tpu.inference import Speech2Text
    from tailored_avsr_tpu.utils.config import load_config

    on_tpu = jax.devices()[0].platform != "cpu"
    frames = args.frames
    samples = frames * 640
    for b in [int(x) for x in args.batches.split(",")]:
        cfg = load_config("configs/AVSR/tailored_transformer+ctc_spanish.yaml")
        lm_cfg = load_config("configs/LM/lm-spanish.yaml")
        if on_tpu:
            cfg.dtype = "bfloat16"
            cfg.encoder_conf = dict(cfg.encoder_conf, use_flash=True)
        cfg.inference_conf = dict(
            cfg.inference_conf, beam_size=args.beam, ctc_weight=0.1,
            lm_weight=0.4, early_exit=False, cache_protocol="anc", unroll=2,
            fused_group_attend=args.fused == "1",
        )
        if args.phase_widths:
            cfg.inference_conf["phase_widths"] = [
                float(x) for x in args.phase_widths.split(",")
            ]
        s2t = Speech2Text(cfg, lm_config=lm_cfg)
        rng = np.random.RandomState(1)
        data = {
            "audio": (rng.randn(b, samples) * 0.1).astype(np.float32),
            "audio_lengths": np.full((b,), samples, np.int32),
            "video": rng.randn(b, frames, 88, 88).astype(np.float32),
            "video_lengths": np.full((b,), frames, np.int32),
            "text": np.ones((b, 8), np.int32),
            "text_lengths": np.full((b,), 8, np.int32),
        }
        s2t.ensure_params(s2t.device_put_batch(dict(
            {k: v[:2] for k, v in data.items()})))
        margs = s2t._shard_args(s2t._model_args(
            {k: np.asarray(v) for k, v in data.items()}))
        key = tuple((a.shape, str(a.dtype)) for a in margs)
        fn = s2t._build_decode(key)
        try:
            compiled = fn.lower(s2t.variables, *margs).compile()
            ma = compiled.memory_analysis()
            line = {
                "batch": b,
                "argument_gb": round(ma.argument_size_in_bytes / 2**30, 2),
                "output_gb": round(ma.output_size_in_bytes / 2**30, 2),
                "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
                "peak_gb": round(
                    (ma.argument_size_in_bytes + ma.output_size_in_bytes
                     + ma.temp_size_in_bytes) / 2**30, 2),
                "generated_code_mb": round(
                    ma.generated_code_size_in_bytes / 2**20, 1),
            }
        except Exception as e:  # noqa: BLE001 — per-point isolation
            line = {"batch": b, "error": f"{type(e).__name__}: {str(e)[:160]}"}
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
