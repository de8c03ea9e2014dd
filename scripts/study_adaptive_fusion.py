#!/usr/bin/env python
"""Export per-utterance adaptive-fusion modality weights.

Working replacement for /root/reference/src/scripts/study_adaptive_fusion.py:
runs an AVSR dataset through the model and writes each utterance's learned
acoustic/visual fusion weights (returned functionally in the aux stats)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import csv
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--load-checkpoint", default="")
    p.add_argument("--dataset", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--mask", default="none", choices=["none", "audio", "video"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tailored_avsr_tpu.data import (
        AVSRDataLoader,
        AVSRDataset,
        get_tokenizer_converter,
    )
    from tailored_avsr_tpu.data.transforms_video import CenterCrop, Compose, Normalise
    from tailored_avsr_tpu.tasks import AVSRTask
    from tailored_avsr_tpu.train.checkpoint import load_model
    from tailored_avsr_tpu.utils import load_config

    config = load_config(args.config_file)
    tokenizer, converter = get_tokenizer_converter(config)
    model = AVSRTask.build_model(config, converter.token_list)
    ds = AVSRDataset(args.dataset, task="avsr", is_training=False)
    loader = AVSRDataLoader(
        ds, 4, task="avsr",
        video_transforms=Compose(
            [Normalise(0.0, 250.0), Normalise(0.421, 0.165), CenterCrop((88, 88))]
        ),
        tokenizer=tokenizer, converter=converter, is_training=False,
    )

    variables = None

    @jax.jit
    def forward(variables, audio, alens, video, vlens, text, tlens):
        _, stats = model.apply(variables, audio, alens, video, vlens, text, tlens)
        return stats["fusion_weights"]

    rows = []
    for batch in loader:
        audio = jnp.asarray(batch["audio"])
        video = jnp.asarray(batch["video"])
        if args.mask == "audio":
            audio = audio * 0.0
        if args.mask == "video":
            video = video * 0.0
        argsb = (
            audio, jnp.asarray(batch["audio_lengths"]),
            video, jnp.asarray(batch["video_lengths"]),
            jnp.asarray(batch["text"]), jnp.asarray(batch["text_lengths"]),
        )
        if variables is None:
            variables = model.init(
                {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)}, *argsb
            )
            if args.load_checkpoint:
                variables = load_model(variables, args.load_checkpoint)
        fw = forward(variables, *argsb)
        wa = np.asarray(fw["acoustic_weight"])
        wv = np.asarray(fw["visual_weight"])
        for sid, a, v in zip(batch["sample_id"], wa, wv):
            rows.append({"sample_id": sid, "acoustic_weight": float(a),
                         "visual_weight": float(v)})

    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, f"fusion_weights_{args.mask}.csv")
    with open(out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["sample_id", "acoustic_weight", "visual_weight"])
        writer.writeheader()
        writer.writerows(rows)
    mean_a = np.mean([r["acoustic_weight"] for r in rows])
    print(f"wrote {out}; mean acoustic weight = {mean_a:.3f}")


if __name__ == "__main__":
    main()
