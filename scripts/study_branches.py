#!/usr/bin/env python
"""Export per-layer learned branch-merge weights (the tailoring signal).

Working replacement for /root/reference/src/scripts/study_branches.py (broken
imports as shipped — SURVEY.md §2.5): runs a dataset through a Branchformer
(ASR/VSR) model, collects each layer's learned_ave attention-vs-cgMLP weights
(returned functionally in the model's aux stats), and writes a per-layer CSV +
heatmap. The per-layer mean attention weight > 0.5 is the signal used to set
``acoustic_use_attn`` / ``visual_use_attn`` when building the tailored model.
"""

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
    p.add_argument("--max-batches", type=int, default=50)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tailored_avsr_tpu.data import (
        AVSRDataLoader,
        AVSRDataset,
        get_tokenizer_converter,
    )
    from tailored_avsr_tpu.data.transforms_video import CenterCrop, Compose, Normalise
    from tailored_avsr_tpu.tasks import ASRTask
    from tailored_avsr_tpu.train.checkpoint import load_model
    from tailored_avsr_tpu.utils import load_config

    config = load_config(args.config_file)
    tokenizer, converter = get_tokenizer_converter(config)
    model = ASRTask.build_model(config, converter.token_list)
    ds = AVSRDataset(args.dataset, task=config.task, is_training=False)
    video_tf = (
        Compose([Normalise(0.0, 250.0), Normalise(0.421, 0.165), CenterCrop((88, 88))])
        if config.task == "vsr"
        else None
    )
    loader = AVSRDataLoader(
        ds, 4, task=config.task, video_transforms=video_tf,
        tokenizer=tokenizer, converter=converter, is_training=False,
    )

    variables = None
    weights_per_layer = {}

    @jax.jit
    def forward(variables, speech, lengths, text, tlens):
        _, stats = model.apply(variables, speech, lengths, text, tlens)
        return stats.get("branch_weights", [])

    for bi, batch in enumerate(loader):
        if bi >= args.max_batches:
            break
        argsb = (
            jnp.asarray(batch["speech"]), jnp.asarray(batch["speech_lengths"]),
            jnp.asarray(batch["text"]), jnp.asarray(batch["text_lengths"]),
        )
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), *argsb)
            if args.load_checkpoint:
                variables = load_model(variables, args.load_checkpoint)
        for layer_idx, aux in forward(variables, *argsb):
            weights_per_layer.setdefault(int(layer_idx), []).append(
                np.asarray(aux["weight_global"])
            )

    os.makedirs(args.output_dir, exist_ok=True)
    rows = []
    for layer_idx in sorted(weights_per_layer):
        w = np.concatenate(weights_per_layer[layer_idx])
        rows.append({
            "layer": layer_idx,
            "mean_attn_weight": float(w.mean()),
            "std_attn_weight": float(w.std()),
            "use_attn": bool(w.mean() > 0.5),
        })
    csv_path = os.path.join(args.output_dir, "branch_scores.csv")
    with open(csv_path, "w", newline="") as f:
        if not rows:
            raise SystemExit(
                "no learned_ave branch weights found — the encoder's "
                "merge_method must be 'learned_ave' (concat/fixed_ave and "
                "conformer layers expose no branch scores)"
            )
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {csv_path}")
    print("use_attn mask:", [r["use_attn"] for r in rows])

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 3))
        data = np.asarray([[r["mean_attn_weight"] for r in rows],
                           [1 - r["mean_attn_weight"] for r in rows]])
        im = ax.imshow(data, aspect="auto", vmin=0, vmax=1, cmap="viridis")
        ax.set_yticks([0, 1], ["attention", "cgMLP"])
        ax.set_xticks(range(len(rows)), [str(r["layer"]) for r in rows])
        ax.set_xlabel("encoder layer")
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(os.path.join(args.output_dir, "branch_scores.png"), dpi=120)
        print("wrote branch_scores.png")
    except Exception as e:  # pragma: no cover
        print(f"(no heatmap: {e})")


if __name__ == "__main__":
    main()
