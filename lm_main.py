#!/usr/bin/env python
"""LM training/evaluation CLI — mirror of the reference's /root/reference/
lm_main.py (same shape: yaml config -> Transformer LM -> epoch loop with
accum-grad + Noam/OneCycle -> per-epoch validation perplexity -> top-K
checkpoint averaging), minus its shipped bugs (undefined ``asr_config`` /
``checkpoint_path`` — ref lm_main.py:85,101)."""

from __future__ import annotations

import argparse
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tailored_avsr_tpu.data import get_tokenizer_converter
from tailored_avsr_tpu.data.dataloader import pad_batch, round_up
from tailored_avsr_tpu.tasks.lm import LMTask
from tailored_avsr_tpu.train import (
    average_models,
    create_train_state,
    save_model,
    save_val_stats,
    set_optimizer,
)
from tailored_avsr_tpu.train.checkpoint import top_k_epochs
from tailored_avsr_tpu.train.loop import TrainState
from tailored_avsr_tpu.utils import load_config
import optax


class LMTextDataset:
    """LM text dataset, both reference modes (ref src/datasets/lm_dataset.py
    + src/utils/lm_dataloader.py:11 ``from_dataset_partiton=".csv" in path``):

    - a ``.csv`` path is an audio-visual dataset partition (splits/**.csv):
      each row's ``transcription_path`` file holds the utterance text on its
      first line;
    - any other path is a raw line-per-utterance text file.

    Text normalization matches the reference: first line, stripped,
    uppercased, '{'/'}' removed.
    """

    def __init__(self, path, tokenizer, converter):
        if ".csv" in path:
            import pandas as pd

            df = pd.read_csv(path, delimiter=",")
            lines = []
            for tpath in df["transcription_path"]:
                with open(tpath, "r", encoding="utf-8") as f:
                    lines.append(f.readlines()[0].strip())
        else:
            with open(path, "r", encoding="utf-8") as f:
                lines = [l.strip() for l in f]
        lines = [l.upper().replace("{", "").replace("}", "") for l in lines]
        self.ids = [
            np.asarray(converter.tokens2ids(tokenizer.text2tokens(l)), np.int32)
            for l in lines
            if l
        ]

    def __len__(self):
        return len(self.ids)


def lm_batches(ds, batch_size, shuffle, rng, bucket=8):
    idx = np.arange(len(ds))
    if shuffle:
        rng.shuffle(idx)
    for i in range(0, len(idx), batch_size):
        chunk = [ds.ids[j] for j in idx[i : i + batch_size]]
        lmax = round_up(max(len(c) for c in chunk), bucket)
        toks = pad_batch(chunk, -1, lmax)
        lens = np.asarray([len(c) for c in chunk], np.int32)
        yield jnp.asarray(toks), jnp.asarray(lens)


def main(argv=None):
    p = argparse.ArgumentParser(description="Transformer LM trainer (TPU-native).")
    p.add_argument("--training-dataset", default="", type=str)
    p.add_argument("--validation-dataset", default="", type=str)
    p.add_argument("--config-file", required=True, type=str)
    p.add_argument("--output-dir", required=True, type=str)
    p.add_argument("--mode", default="training", type=str)
    p.add_argument("--yaml-overrides", metavar="CONF:KEY:VALUE", nargs="*")
    args = p.parse_args(argv)

    config = load_config(args.config_file, args.yaml_overrides)
    tokenizer, converter = get_tokenizer_converter(config)
    model = LMTask.build_model(config, converter.token_list)
    ts = config.training_settings

    train_ds = LMTextDataset(args.training_dataset, tokenizer, converter)
    val_ds = LMTextDataset(args.validation_dataset or args.training_dataset, tokenizer, converter)

    rng = jax.random.PRNGKey(0)
    nprng = np.random.RandomState(0)
    first_toks, first_lens = next(lm_batches(train_ds, ts["batch_size"], False, nprng))
    variables = model.init(rng, first_toks, first_lens)
    steps = (len(train_ds) + ts["batch_size"] - 1) // ts["batch_size"]
    tx, _ = set_optimizer(ts, model_size=model.att_unit, steps_per_epoch=steps)
    state = create_train_state(variables, tx)

    @jax.jit
    def train_step(state, toks, lens, rng):
        def loss_fn(params):
            nll, counts = model.apply(
                {"params": params}, toks, lens, method="nll",
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, state.step)},
            )
            return jnp.sum(nll) / jnp.maximum(jnp.sum(counts), 1)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=state.batch_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    @jax.jit
    def eval_step(state, toks, lens):
        nll, counts = model.apply({"params": state.params}, toks, lens, method="nll")
        return jnp.sum(nll), jnp.sum(counts)

    os.makedirs(os.path.join(args.output_dir, "models"), exist_ok=True)
    val_stats = []
    for epoch in range(1, ts["epochs"] + 1):
        t0, tot, n = time.time(), 0.0, 0
        for toks, lens in lm_batches(train_ds, ts["batch_size"], True, nprng):
            state, loss = train_step(state, toks, lens, rng)
            tot += float(loss)
            n += 1
        nll_sum, count = 0.0, 0
        for toks, lens in lm_batches(val_ds, ts["batch_size"], False, nprng):
            s, c = eval_step(state, toks, lens)
            nll_sum += float(s)
            count += int(c)
        ppl = math.exp(nll_sum / max(count, 1))
        print(
            f"Epoch {epoch}: TRAIN LOSS={tot / max(n, 1):.3f} | VAL PPL={ppl:.2f} "
            f"| {time.time() - t0:.1f}s"
        )
        ckpt = os.path.join(args.output_dir, "models", f"model_{epoch:03d}.ckpt")
        save_model({"params": jax.device_get(state.params)}, ckpt)
        val_stats.append({"epoch": epoch, "cer": ppl, "path": ckpt})

    save_val_stats(
        os.path.join(args.output_dir, "val_stats.csv"),
        [{"epoch": r["epoch"], "ppl": r["cer"]} for r in val_stats],
    )
    best = top_k_epochs(val_stats, ts.get("average_epochs", 1))
    paths = [os.path.join(args.output_dir, "models", f"model_{e:03d}.ckpt") for e in best]
    avg = average_models({"params": jax.device_get(state.params)}, paths)
    save_model(avg, os.path.join(args.output_dir, "models", "model_average.ckpt"))
    print(f"averaged top-{len(paths)} checkpoints -> model_average.ckpt")


if __name__ == "__main__":
    main()
