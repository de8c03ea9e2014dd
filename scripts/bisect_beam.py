#!/usr/bin/env python
"""Bisect the joint CTC/attention(+LM) beam-decode graph: encode-only vs full
decode with and without the LM, at a given (batch, beam). Device-resident
timing with honest result fetch."""

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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--frames", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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
    secs = b * samples / 16000.0

    for label, lm_on in (("beam_no_lm", False), ("beam_lm", True)):
        cfg = load_config("configs/AVSR/tailored_transformer+ctc_spanish.yaml")
        lm_cfg = load_config("configs/LM/lm-spanish.yaml") if lm_on else None
        if on_tpu:
            cfg.dtype = "bfloat16"
            cfg.encoder_conf = dict(cfg.encoder_conf, use_flash=True)
        cfg.inference_conf = dict(
            cfg.inference_conf, beam_size=args.beam, ctc_weight=0.1,
            lm_weight=0.4, early_exit=False,
        )
        s2t = Speech2Text(cfg, lm_config=lm_cfg)
        d = s2t.device_put_batch(dict(data))
        s2t.ensure_params(d)
        margs = s2t._model_args(d)

        if not lm_on:
            # encode-only (shared by both variants; measure once)
            enc = jax.jit(
                lambda v, *a: s2t.model.apply(v, *a, method="encode")
            )
            dt_e = timeit(enc, s2t.variables, *margs)
            print(json.dumps({
                "stage": "encode", "ms": round(dt_e * 1e3, 1),
                "rtf": round(secs / dt_e, 1),
            }), flush=True)

        dt = timeit(lambda dd: s2t._decode_arrays(dd), d, iters=5)
        print(json.dumps({
            "stage": label, "ms": round(dt * 1e3, 1),
            "rtf": round(secs / dt, 1),
        }), flush=True)
        del s2t


if __name__ == "__main__":
    main()
