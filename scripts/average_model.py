#!/usr/bin/env python
"""Offline checkpoint averaging (uniform parameter mean).

Working replacement for /root/reference/src/scripts/average_model.py and
avg_maskctc.py: average explicit checkpoint paths, or the top-K epochs of an
experiment directory by its val_stats.csv."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import csv
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoints", nargs="*", default=[])
    p.add_argument("--exp-dir", default="", help="experiment dir with val_stats.csv")
    p.add_argument("--val-accs", default="",
                   help="val_accs.csv from scripts/get_val_accs.py (the "
                        "reference avg_maskctc.py protocol: sort by (wer, "
                        "cer), average the top-K model_check_path entries)")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--metric", default="cer")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    from tailored_avsr_tpu.train.checkpoint import average_models, load_model, save_model

    paths = list(args.checkpoints)
    if args.val_accs:
        with open(args.val_accs) as f:
            rows = list(csv.DictReader(f))
        rows.sort(key=lambda r: (float(r["wer"]), float(r["cer"])))
        paths += [r["model_check_path"] for r in rows[: args.top_k]]
    if args.exp_dir:
        from tailored_avsr_tpu.train.checkpoint import top_k_epochs

        with open(os.path.join(args.exp_dir, "val_stats.csv")) as f:
            rows = list(csv.DictReader(f))
        stats = [
            {"epoch": int(r["epoch"]), "cer": float(r[args.metric])}
            for r in rows
        ]
        paths += [
            os.path.join(args.exp_dir, "models", f"model_{e:03d}.ckpt")
            for e in top_k_epochs(stats, args.top_k)
        ]
    assert paths, "no checkpoints given"
    import flax.serialization
    import msgpack  # noqa: F401  (flax uses msgpack internally)

    # use the first checkpoint's own structure as the template
    with open(paths[0], "rb") as f:
        template = flax.serialization.msgpack_restore(f.read())
    avg = average_models(template, paths)
    save_model(avg, args.output)
    print(f"averaged {len(paths)} checkpoints -> {args.output}")


if __name__ == "__main__":
    main()
