#!/usr/bin/env python
"""Benchmark: batched AVSR inference real-time factor on the flagship tailored
model (256-d, 12-block tailored audio-visual Branchformer, the reference's
headline config) on whatever accelerator JAX sees (TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: real-time factor of full AVSR inference (audio+video frontends,
tailored encoder with the Pallas fused-attention kernel, adaptive fusion,
greedy CTC) in bfloat16 at batch 128 = audio-seconds transcribed per wall
second per chip. The reference repo publishes no RTF numbers (BASELINE.md);
the north-star is >=5x an A100 PyTorch baseline. A100 PyTorch inference of
comparable espnet-class AVSR stacks runs around ~30x real time at batch 1;
vs_baseline reports value / (5 * 30) — progress toward the 5x-A100 target
under that stand-in until a measured A100 number exists.

Timing fetches the result every iteration (np.asarray): on some transports
(the axon tunnel) block_until_ready returns before execution finishes, so
fetch-free timing over-reports throughput.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    on_tpu = jax.devices()[0].platform != "cpu"
    model = _build_flagship(use_flash=on_tpu)

    # 4-second utterances at 25 fps; throughput saturates at batch 128
    # (honest-fetch RTF: 1136x @32, 1529x @64, 2958x @128, 3016x @256)
    batch, frames = 128, 100
    rng = np.random.RandomState(0)
    samples = frames * 640
    audio = jnp.asarray(rng.randn(batch, samples).astype(np.float32) * 0.1)
    alens = jnp.full((batch,), samples, np.int32)
    video = jnp.asarray(rng.randn(batch, frames, 88, 88).astype(np.float32))
    vlens = jnp.full((batch,), frames, np.int32)

    # init on a 2-row batch (params are batch-independent; avoids compiling a
    # second full-size graph just for initialization)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)},
        audio[:2], alens[:2], video[:2], vlens[:2],
        jnp.ones((2, 8), jnp.int32), jnp.full((2,), 8, np.int32),
    )
    if on_tpu:  # bf16 weights/activations: free TPU win (SURVEY.md §2.4)
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            variables,
        )
        audio = audio.astype(jnp.bfloat16)
        video = video.astype(jnp.bfloat16)

    @jax.jit
    def infer(audio, alens, video, vlens):
        return model.apply(
            variables, audio, alens, video, vlens, method="ctc_greedy"
        )

    # warmup/compile — the remote-compile tunnel can drop transiently; retry
    for attempt in range(3):
        try:
            ids, lens = infer(audio, alens, video, vlens)
            np.asarray(ids)  # fetch: block_until_ready may lie (see docstring)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(10)

    iters = 10
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        ids, lens = infer(audio, alens, video, vlens)
        np.asarray(ids)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    audio_seconds = batch * samples / 16000.0
    rtf = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "avsr_inference_rtf_greedy_batch128_bf16",
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / 150.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
