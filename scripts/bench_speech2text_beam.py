"""End-to-end Speech2Text beam-search RTF on the flagship AVSR model.

Measures the full user-facing path (__call__: jitted encode + joint beam
search + host detokenization) at batch 8, beam 10, 4-second utterances —
the configuration DESIGN.md's earlier 36x-RT figure was recorded at.
"""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import time

import numpy as np

import jax

from tailored_avsr_tpu.inference import Speech2Text
from tailored_avsr_tpu.utils.config import load_config

B, FRAMES = 8, 100  # 4 s at 25 fps


def main(dtype="float32", beam=10):
    cfg = load_config("configs/AVSR/tailored_transformer+ctc_spanish.yaml")
    cfg.token_list = "tokenizers/char/spanish.txt"
    cfg.dtype = dtype
    on_tpu = jax.devices()[0].platform != "cpu"
    cfg.encoder_conf = dict(cfg.encoder_conf, use_flash=on_tpu)
    cfg.inference_conf = dict(
        getattr(cfg, "inference_conf", {}) or {}, beam_size=beam, ctc_weight=0.3
    )
    s2t = Speech2Text(cfg)

    rng = np.random.RandomState(0)
    samples = FRAMES * 640
    batch = {
        "audio": rng.randn(B, samples).astype(np.float32) * 0.1,
        "audio_lengths": np.full((B,), samples, np.int32),
        "video": rng.randn(B, FRAMES, 88, 88).astype(np.float32),
        "video_lengths": np.full((B,), FRAMES, np.int32),
        "text": np.ones((B, 8), np.int32),
        "text_lengths": np.full((B,), 8, np.int32),
    }

    t0 = time.perf_counter()
    s2t(batch)
    print(f"compile+first call: {time.perf_counter() - t0:.0f} s", flush=True)
    audio_s = B * samples / 16000.0
    times = []
    for i in range(4):
        batch["audio"] = batch["audio"] + 1e-6 * i
        t0 = time.perf_counter()
        out = s2t(batch)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(
        f"speech2text beam{beam} {dtype} (host batch): {dt * 1e3:.0f} ms/batch "
        f"({audio_s / dt:.0f}x RT per chip)  hyp0={out[0][0][:40]!r}", flush=True
    )
    # device-resident inputs: isolates the H2D tunnel transfer from decode
    import jax.numpy as jnp

    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    jax.block_until_ready(list(dev_batch.values()))
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        out = s2t(dev_batch)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(
        f"speech2text beam{beam} {dtype} (device-resident): {dt * 1e3:.0f} ms/batch "
        f"({audio_s / dt:.0f}x RT per chip)", flush=True
    )
    # pipelined stream: host batches, threaded H2D overlapped with decode
    nb = 6
    host_batches = [
        {k: (v + 1e-6 * i if k == "audio" else v) for k, v in batch.items()}
        for i in range(nb)
    ]
    t0 = time.perf_counter()
    n = sum(1 for _ in s2t.stream(iter(host_batches)))
    dt = (time.perf_counter() - t0) / n
    print(
        f"speech2text beam{beam} {dtype} (streamed f32 x{n}): {dt * 1e3:.0f} ms/batch "
        f"({audio_s / dt:.0f}x RT per chip)", flush=True
    )
    # quantized inputs (uint8 video / int16 audio), device-side normalization
    s2t.quantize_audio = True
    q_batches = []
    for i in range(nb):
        qb = dict(batch)
        qb["audio"] = batch["audio"] + 1e-6 * i
        qb["video"] = np.clip(batch["video"] * 40 + 120, 0, 255).astype(np.uint8)
        q_batches.append(qb)
    next(iter(s2t.stream([dict(q_batches[0])])))  # compile the uint8 graph
    t0 = time.perf_counter()
    n = sum(1 for _ in s2t.stream(iter(q_batches)))
    dt = (time.perf_counter() - t0) / n
    print(
        f"speech2text beam{beam} {dtype} (streamed u8/i16 x{n}): {dt * 1e3:.0f} ms/batch "
        f"({audio_s / dt:.0f}x RT per chip)"
    )


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    main("bfloat16")
    main("float32")
