#!/usr/bin/env python
"""Per-scorer cost sweep of the jitted joint beam decode: times the decode
graph with (attention-only | +CTC prefix | +LM) at given batch/beam, reports
ms-per-step for each increment, and checks the LM cache dtype actually
matches the compute dtype. Device-resident timing with honest result fetch."""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import argparse
import json
import time

import numpy as np


def timeit(fn, *args, iters=5):
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32", help="comma-separated batch sizes")
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--variants", default="att,att+ctc,att+ctc+lm")
    ap.add_argument("--protocol", default="anc",
                    help="beam KV-cache protocol: anc | append")
    ap.add_argument("--unroll", type=int, default=2)
    ap.add_argument("--phase-widths", default="",
                    help="comma-separated phased attend widths (fractions "
                         "<=1 of max length or absolute columns)")
    ap.add_argument("--fused", default="auto", choices=["auto", "0", "1"],
                    help="group-attend kernel A/B: auto = Pallas on TPU, "
                         "0 = force the XLA formulation, 1 = force Pallas")
    ap.add_argument("--quantize", default="",
                    choices=["", "lm", "asr", "lm+asr"],
                    help="weight-only int8 quantization A/B "
                         "(utils/quantize.py): which model(s) to quantize")
    ap.add_argument("--cache-dtype", default="",
                    choices=["", "bfloat16", "float32", "int8"],
                    help="beam KV-cache dtype A/B (ops/kv_quant.py): int8 "
                         "halves attend traffic on the anc protocol")
    ap.add_argument("--mem-dtype", default="", choices=["", "int8"],
                    help="cross-attention memory K/V dtype A/B: int8 halves "
                         "the never-phased per-step encoder-memory read")
    args = ap.parse_args()

    import jax

    from tailored_avsr_tpu.inference import Speech2Text
    from tailored_avsr_tpu.utils.config import load_config

    on_tpu = jax.devices()[0].platform != "cpu"
    frames = args.frames
    samples = frames * 640

    for b in [int(x) for x in args.batches.split(",")]:
        rng = np.random.RandomState(0)
        data = {
            "audio": (rng.randn(b, samples) * 0.1).astype(np.float32),
            "audio_lengths": np.full((b,), samples, np.int32),
            "video": rng.randn(b, frames, 88, 88).astype(np.float32),
            "video_lengths": np.full((b,), frames, np.int32),
            "text": np.ones((b, 8), np.int32),
            "text_lengths": np.full((b,), 8, np.int32),
        }
        secs = b * samples / 16000.0

        for variant in args.variants.split(","):
            # one failed point (OOM at a big batch, a transient tunnel 500)
            # must not take down the rest of the sweep — every remote beam
            # compile lost costs 15-20 min to redo, there is no cross-process
            # compile cache
            try:
                run_point(args, on_tpu, b, variant, data, secs, frames)
            except Exception as e:  # noqa: BLE001 — per-point isolation
                print(json.dumps({
                    "batch": b, "variant": variant,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }), flush=True)


def run_point(args, on_tpu, b, variant, data, secs, frames):
    import jax

    from tailored_avsr_tpu.inference import Speech2Text
    from tailored_avsr_tpu.utils.config import load_config

    ctc_w = 0.1 if "ctc" in variant else 0.0
    lm_on = "lm" in variant
    cfg = load_config("configs/AVSR/tailored_transformer+ctc_spanish.yaml")
    lm_cfg = load_config("configs/LM/lm-spanish.yaml") if lm_on else None
    if on_tpu:
        cfg.dtype = "bfloat16"
        cfg.encoder_conf = dict(cfg.encoder_conf, use_flash=True)
    cfg.inference_conf = dict(
        cfg.inference_conf, beam_size=args.beam, ctc_weight=ctc_w,
        lm_weight=0.4 if lm_on else 0.0, early_exit=False,
        cache_protocol=args.protocol, unroll=args.unroll,
    )
    if args.fused != "auto":
        cfg.inference_conf["fused_group_attend"] = args.fused == "1"
    if args.phase_widths:
        cfg.inference_conf["phase_widths"] = [
            float(x) for x in args.phase_widths.split(",")
        ]
    if "lm" in args.quantize:
        cfg.inference_conf["quantize_lm"] = True
    if "asr" in args.quantize:
        cfg.inference_conf["quantize_asr_model"] = True
    if args.cache_dtype:
        cfg.inference_conf["cache_dtype"] = args.cache_dtype
    if args.mem_dtype:
        cfg.inference_conf["mem_dtype"] = args.mem_dtype
    s2t = Speech2Text(cfg, lm_config=lm_cfg)
    d = s2t.device_put_batch(dict(data))
    dt = timeit(lambda dd: s2t._decode_arrays(dd), d, iters=5)
    line = {
        "batch": b, "protocol": args.protocol, "unroll": args.unroll,
        "fused": args.fused, "phases": args.phase_widths or None,
        "quantize": args.quantize or None,
        "cache_dtype": args.cache_dtype or None,
        "mem_dtype": args.mem_dtype or None,
        "variant": variant, "ms": round(dt * 1e3, 1),
        "rtf": round(secs / dt, 1),
        # the full loop runs ~one step per encoder frame (early_exit
        # off); approximate per-step cost for bisection notes
        "ms_per_step": round(dt * 1e3 / frames, 2),
    }
    # MFU of the compiled decode graph (XLA cost analysis / wall /
    # chip peak), same accounting as bench.py
    try:
        import bench

        bargs = s2t._shard_args(s2t._model_args(d))
        key = tuple((a.shape, str(a.dtype)) for a in bargs)
        flops = bench.graph_flops(
            s2t._decode_jit[key], s2t.variables, *bargs
        )
        peak = bench.peak_for(jax.devices()[0])
        line.update(bench.perf_fields(flops, dt, peak, b))
    except Exception:
        pass
    if lm_on:  # params are lazily initialized by the first decode
        line["lm_param_dtypes"] = sorted({
            str(x.dtype)
            for x in jax.tree_util.tree_leaves(s2t.lm_variables)
            if hasattr(x, "dtype") and "float" in str(x.dtype)
        })
    print(json.dumps(line), flush=True)
    del s2t


if __name__ == "__main__":
    main()
