#!/usr/bin/env python
"""Re-decode the validation set with every epoch checkpoint of an experiment
and write a `val_accs.csv` ranking (model_check_path, epoch, wer, cer).

Working replacement for /root/reference/src/scripts/get_maskctc_val_accs.py
(broken as shipped — stale `src.bin.*` imports, SURVEY.md §2.5): the reference
decodes the validation split once per saved epoch and records WER/CER so that
checkpoint averaging can pick the top-K epochs by *decoded* error rate rather
than the teacher-forced validation CER the training loop logs. The CSV this
writes feeds `scripts/average_model.py --val-accs` (the reference's
avg_maskctc.py protocol: sort by (wer, cer), average the first K).

Works for any model family the inference engine supports (espnet/maskctc,
asr/vsr/avsr) — decoding goes through `Speech2Text`, which dispatches on the
config's `model:` key.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import csv
import glob
import re


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True,
                   help="model config yaml (the experiment's architecture)")
    p.add_argument("--validation-dataset", required=True)
    p.add_argument("--exp-dir", default="",
                   help="experiment dir: decodes every models/model_*.ckpt")
    p.add_argument("--checkpoints", nargs="*", default=[],
                   help="explicit checkpoint paths (instead of --exp-dir)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--mask", default="none", choices=["none", "audio", "video"])
    args = p.parse_args(argv)

    from tailored_avsr_tpu.data import (
        AVSRDataLoader,
        AVSRDataset,
        get_tokenizer_converter,
    )
    from tailored_avsr_tpu.data.transforms_video import (
        CenterCrop,
        Compose,
        Normalise,
    )
    from tailored_avsr_tpu.evaluation import compute_bootstrap_wer, write_inf_file
    from tailored_avsr_tpu.inference import Speech2Text
    from tailored_avsr_tpu.utils import load_config

    ckpts = list(args.checkpoints)
    if args.exp_dir:
        ckpts += sorted(glob.glob(os.path.join(args.exp_dir, "models", "model_*.ckpt")))
    ckpts = [c for c in ckpts if not c.endswith("model_average.ckpt")]
    assert ckpts, "no checkpoints given (--exp-dir or --checkpoints)"

    config = load_config(args.config_file)
    task = config.task
    tokenizer, converter = get_tokenizer_converter(config)
    ds = AVSRDataset(args.validation_dataset, task=task, is_training=False)
    inf_conf = dict(getattr(config, "inference_conf", {}) or {})
    video_tf = Compose([
        Normalise(0.0, 250.0), Normalise(0.421, 0.165), CenterCrop((88, 88)),
    ])

    inf_dir = os.path.join(args.output_dir, "inferences")
    os.makedirs(inf_dir, exist_ok=True)
    rows = []
    for ckpt in ckpts:
        m = re.search(r"model_(\d+)\.ckpt$", os.path.basename(ckpt))
        epoch = int(m.group(1)) if m else -1
        s2t = Speech2Text(config, ckpt_path=ckpt)
        loader = AVSRDataLoader(
            ds, int(inf_conf.get("batch_size", 1)), task=task,
            video_transforms=video_tf,
            tokenizer=tokenizer, converter=converter, is_training=False,
        )

        def batches():
            for batch in loader:
                if task == "avsr" and args.mask == "audio":
                    batch["audio"] = batch["audio"] * 0.0
                if task == "avsr" and args.mask == "video":
                    batch["video"] = batch["video"] * 0.0
                yield batch

        pairs = []
        for batch, results in s2t.stream(batches()):
            pairs += list(zip(batch["refs"], results))
        inf_path = os.path.join(inf_dir, f"val_{epoch:03d}.inf")
        write_inf_file(inf_path, pairs)
        wer, cer, ci_w, ci_c = compute_bootstrap_wer(inf_path)
        with open(inf_path.replace(".inf", ".wer"), "w") as f:
            f.write(f"WER: {wer:.2f} +- {ci_w:.2f}\nCER: {cer:.2f} +- {ci_c:.2f}\n")
        print(f"epoch {epoch}: WER {wer:.2f} CER {cer:.2f} ({ckpt})")
        rows.append({
            "model_check_path": ckpt, "epoch": epoch,
            "wer": round(wer, 4), "cer": round(cer, 4),
        })

    rows.sort(key=lambda r: (r["wer"], r["cer"]))
    out_csv = os.path.join(args.output_dir, "val_accs.csv")
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["model_check_path", "epoch", "wer", "cer"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_csv} ({len(rows)} checkpoints, best first)")
    return rows


if __name__ == "__main__":
    main()
