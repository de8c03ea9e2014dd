#!/usr/bin/env python
"""Measured torch-vs-JAX baseline on IDENTICAL hardware (this host's CPU).

VERDICT round-1 item 10: the 30x-A100 figure bench.py normalizes against is a
stand-in, not a measurement. This script anchors the framework side of the
comparison with something measurable in this environment: the SAME flagship
greedy AVSR graph (same weights, via ``export_torch_state_dict``) timed in
PyTorch (the reference's framework; tests/torch_twins.TorchAVSRFlagship,
numerics-verified against flax in tests/test_torch_flagship.py) and in
JAX-CPU. The chip side (TPU vs A100) still needs real A100 access; DESIGN.md
documents how the stand-in maps onto this ratio.

Prints one JSON line:
  {"torch_cpu_rtf", "jax_cpu_rtf", "jax_over_torch", "batch", "audio_seconds"}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from __graft_entry__ import _build_flagship
    from tailored_avsr_tpu.utils.torch_compat import export_torch_state_dict
    from tests.torch_twins import TorchAVSRFlagship

    batch, frames = 4, 50  # 2-second utterances; tractable on one CPU
    samples = frames * 640
    rng = np.random.RandomState(0)
    audio = (rng.randn(batch, samples) * 0.1).astype(np.float32)
    alens = np.full((batch,), samples, np.int32)
    video = rng.randn(batch, frames, 88, 88).astype(np.float32)
    vlens = np.full((batch,), frames, np.int32)
    audio_seconds = batch * samples / 16000.0

    model = _build_flagship(use_flash=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)},
        jnp.asarray(audio[:1]), jnp.asarray(alens[:1]),
        jnp.asarray(video[:1]), jnp.asarray(vlens[:1]),
        jnp.ones((1, 4), jnp.int32), jnp.full((1,), 4, jnp.int32),
    )

    vocab = int(variables["params"]["ctc"]["ctc_lo"]["bias"].shape[0])
    tw = TorchAVSRFlagship(vocab=vocab).eval()
    sd = export_torch_state_dict(variables)
    missing, unexpected = tw.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected
    assert all(m.endswith(".num_batches_tracked") for m in missing)

    # --- torch CPU ---------------------------------------------------------
    t_args = (
        torch.from_numpy(audio), torch.from_numpy(alens.astype(np.int64)),
        torch.from_numpy(video), torch.from_numpy(vlens.astype(np.int64)),
    )
    with torch.no_grad():
        tw.ctc_greedy(*t_args)  # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            tw.ctc_greedy(*t_args)
            times.append(time.perf_counter() - t0)
    dt_torch = min(times)

    # --- JAX CPU ------------------------------------------------------------
    @jax.jit
    def infer(a, al, v, vl):
        return model.apply(variables, a, al, v, vl, method="ctc_greedy")

    j_args = (jnp.asarray(audio), jnp.asarray(alens),
              jnp.asarray(video), jnp.asarray(vlens))
    np.asarray(infer(*j_args)[0])  # warmup/compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = infer(*j_args)
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    dt_jax = min(times)

    print(json.dumps({
        "torch_cpu_rtf": round(audio_seconds / dt_torch, 2),
        "jax_cpu_rtf": round(audio_seconds / dt_jax, 2),
        "jax_over_torch": round(dt_torch / dt_jax, 3),
        "batch": batch,
        "audio_seconds": audio_seconds,
        "torch_threads": torch.get_num_threads(),
    }), flush=True)


if __name__ == "__main__":
    main()
