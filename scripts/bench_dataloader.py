#!/usr/bin/env python
"""Host input-pipeline throughput bench (no accelerator needed).

The device side trains at hundreds of times real time (docs/DESIGN.md), so
the binding constraint for real training is whether the HOST pipeline —
CSV → wav read → npz video decode → augmentations → tokenize → bucket-pad →
prefetch — can keep the chip fed. This measures it: utterances/sec and the
real-time multiple the loader sustains per host core, with a per-stage
breakdown (dataset read vs transforms vs collate).

Uses the synthetic corpus generator the tests use (tests/synthetic.py), so
it runs anywhere; point --csv at a real split to measure real data.
"""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv", default="", help="dataset split CSV (default: synthetic)")
    p.add_argument("--n", type=int, default=64, help="synthetic corpus size")
    p.add_argument("--frames", type=int, default=100, help="synthetic utterance frames")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--task", default="avsr")
    p.add_argument("--epochs", type=int, default=3,
                   help="timed passes (first pass warms the page cache)")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--workers", type=int, default=0,
                   help="parallel sample-read threads (training_settings "
                        "num_workers)")
    args = p.parse_args(argv)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))

    from tailored_avsr_tpu.data.dataset import AVSRDataset
    from tailored_avsr_tpu.data.dataloader import AVSRDataLoader
    from tailored_avsr_tpu.data.tokenizer import (
        CharTokenizer, TokenIDConverter, load_token_list,
    )

    if args.csv:
        csv_path = args.csv
        token_path = "tokenizers/char/spanish.txt"
    else:
        from synthetic import make_synthetic_corpus

        root = "/tmp/bench_loader_corpus"
        csv_path, token_path = make_synthetic_corpus(
            root, n=args.n, nframes=args.frames
        )

    tokenizer = CharTokenizer()
    converter = TokenIDConverter(load_token_list(token_path))

    if args.no_augment:
        atf = vtf = None
    else:
        # the exact training augmentation stack avsr_main.py builds
        from tailored_avsr_tpu.data.transforms_audio import Compose, SpeedRate
        from tailored_avsr_tpu.data.transforms_video import (
            HorizontalFlip, Normalise, RandomCrop,
            TimeMasking as VideoTimeMasking,
        )

        atf = Compose([SpeedRate(sample_rate=16000)])
        vtf = Compose([
            Normalise(0.0, 250.0),
            Normalise(0.421, 0.165),
            VideoTimeMasking(),
            RandomCrop((88, 88)),
            HorizontalFlip(0.5),
        ])

    ds = AVSRDataset(csv_path, task=args.task)
    loader = AVSRDataLoader(
        ds, batch_size=args.batch_size, task=args.task,
        audio_transforms=atf, video_transforms=vtf,
        tokenizer=tokenizer, converter=converter, is_training=True,
        workers=args.workers,
    )

    # stage breakdown on one pass (un-prefetched, so stages are attributable)
    t0 = time.perf_counter()
    raw = [ds[i] for i in range(min(len(ds), 32))]
    t_read = (time.perf_counter() - t0) / len(raw)
    t_tf = 0.0
    if vtf is not None:
        t0 = time.perf_counter()
        for s in raw:
            vtf(s["video"])
            atf(s["audio"])
        t_tf = (time.perf_counter() - t0) / len(raw)

    best = None
    for ep in range(args.epochs):
        n_utt = 0
        audio_s = 0.0
        t0 = time.perf_counter()
        for batch in loader:
            key = "audio_lengths" if args.task == "avsr" else "speech_lengths"
            lens = batch[key]
            n_utt += len(lens)
            audio_s += float(lens.sum()) / 16000.0
        dt = time.perf_counter() - t0
        rate = n_utt / dt
        if ep == 0 and args.epochs > 1:
            continue  # warmup pass (page cache, thread spin-up) not reported
        if best is None or rate > best[0]:
            best = (rate, audio_s / dt, dt)

    print(json.dumps({
        "csv": args.csv or f"synthetic(n={args.n},T={args.frames})",
        "task": args.task,
        "batch_size": args.batch_size,
        "augment": not args.no_augment,
        "workers": args.workers,
        "utt_per_sec": round(best[0], 1),
        "rt_multiple_per_host_core": round(best[1], 1),
        "ms_per_utt_read": round(t_read * 1e3, 2),
        "ms_per_utt_transform": round(t_tf * 1e3, 2),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
