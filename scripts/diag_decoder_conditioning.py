#!/usr/bin/env python
"""Decoder-conditioning probe for a (partially) trained flagship checkpoint.

Answers the question a stalled overfit cannot: is the attention branch
actually CONDITIONED on the encoder memory, or has it degenerated into an
unconditional character LM (the failure signature of r5 overfit v1, where
every beam hypothesis collapsed to the corpus-prior word and loss_att sat
near unigram entropy)?

Measures, on the overfit corpus, with deterministic=True:
  - loss_att / acc with the TRUE encoder memory
  - loss_att / acc with the memory ROLLED by one utterance across the batch
    (same marginal statistics, wrong pairing). If rolling barely moves the
    loss, the decoder is ignoring the memory; if it hurts a lot, the decoder
    is conditioned and a stall is an optimization-speed problem instead.
  - loss_ctc (the CTC branch's view of the same encoder output)
  - adaptive-fusion weights (is the informative branch being drowned?)

Usage: python scripts/diag_decoder_conditioning.py \
           [--scratch /tmp/overfit_flagship_r5] [--ckpt model_100.ckpt]
"""

import _pathfix  # noqa: F401

import argparse
import glob
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scratch", default="/tmp/overfit_flagship_r5")
    ap.add_argument("--ckpt", default="",
                    help="checkpoint filename under <scratch>/exp/models "
                         "(default: highest-numbered model_*.ckpt)")
    ap.add_argument("--config",
                    default="configs/AVSR/tailored_transformer+ctc_spanish_tpu.yaml")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from tailored_avsr_tpu.data import (
        AVSRDataLoader, AVSRDataset, get_tokenizer_converter,
    )
    from tailored_avsr_tpu.data.transforms_audio import AddNoise, Compose
    from tailored_avsr_tpu.data.transforms_video import CenterCrop, Normalise
    from tailored_avsr_tpu.tasks import AVSRTask
    from tailored_avsr_tpu.train.checkpoint import load_model
    from tailored_avsr_tpu.utils import load_config

    cfg = load_config(args.config)
    cfg.dtype = "float32"
    # CPU probe: the Pallas flash kernels only lower on TPU
    cfg.encoder_conf = dict(cfg.encoder_conf, use_flash=False)
    tokenizer, converter = get_tokenizer_converter(cfg)
    model = AVSRTask.build_model(cfg, converter.token_list)
    cls = type(model)

    rng = jax.random.PRNGKey(0)
    template = model.init(
        {"params": rng, "mlm": rng},
        jnp.zeros((1, 640 * 4), jnp.float32), jnp.full((1,), 640 * 4, jnp.int32),
        jnp.zeros((1, 4, 88, 88), jnp.float32), jnp.full((1,), 4, jnp.int32),
        jnp.ones((1, 3), jnp.int32), jnp.full((1,), 3, jnp.int32),
    )
    ckpt = args.ckpt
    if not ckpt:
        cands = sorted(glob.glob(
            os.path.join(args.scratch, "exp", "models", "model_*.ckpt")))
        assert cands, f"no checkpoints under {args.scratch}/exp/models"
        ckpt = cands[-1]
    else:
        ckpt = os.path.join(args.scratch, "exp", "models", ckpt)
    variables = load_model(
        {"params": template["params"], "batch_stats": template["batch_stats"]},
        ckpt,
    )
    print(f"checkpoint: {ckpt}")

    mean, std = 0.421, 0.165
    loader = AVSRDataLoader(
        AVSRDataset(os.path.join(args.scratch, "corpus", "split.csv"),
                    task="avsr", is_training=False),
        32, task="avsr",
        audio_transforms=Compose([AddNoise(noise=None, snr_target=9999)]),
        video_transforms=Compose([
            Normalise(0.0, 250.0), Normalise(mean, std), CenterCrop((88, 88)),
        ]),
        tokenizer=tokenizer, converter=converter, is_training=False,
    )
    batch = next(iter(loader))
    audio = jnp.asarray(batch["audio"], jnp.float32)
    alens = jnp.asarray(batch["audio_lengths"], jnp.int32)
    video = jnp.asarray(batch["video"], jnp.float32)
    vlens = jnp.asarray(batch["video_lengths"], jnp.int32)
    text = jnp.asarray(batch["text"], jnp.int32)
    tlens = jnp.asarray(batch["text_lengths"], jnp.int32)

    enc_out, enc_lens, aux = model.apply(
        variables, audio, alens, video, vlens,
        deterministic=True, method=cls.encode,
    )

    def att(eo, el):
        loss, acc = model.apply(
            variables, eo, el, text, tlens, True, method=cls._calc_att_loss,
        )
        return float(loss), float(acc)

    loss_att, acc = att(enc_out, enc_lens)
    loss_att_rolled, acc_rolled = att(
        jnp.roll(enc_out, 1, axis=0), jnp.roll(enc_lens, 1, axis=0)
    )
    loss_ctc = float(model.apply(
        variables, enc_out, enc_lens, text, tlens,
        method=lambda m, eo, el, t, tl: m.ctc.loss(eo, el, t, tl),
    ))

    fusion = aux.get("fusion_weights") if aux else None
    report = {
        "ckpt": os.path.basename(ckpt),
        "loss_att": round(loss_att, 4),
        "acc": round(acc, 4),
        "loss_att_rolled_memory": round(loss_att_rolled, 4),
        "acc_rolled_memory": round(acc_rolled, 4),
        "conditioning_gap": round(loss_att_rolled - loss_att, 4),
        "loss_ctc": round(loss_ctc, 4),
        "fusion_weights_mean": (
            {k: round(float(np.mean(np.asarray(w))), 4)
             for k, w in fusion.items()}
            if fusion else None
        ),
    }
    print(json.dumps(report))
    if loss_att_rolled - loss_att < 0.1:
        print("VERDICT: decoder is NOT conditioned on the encoder memory "
              "(rolling it across utterances barely moves the loss)")
    else:
        print("VERDICT: decoder IS conditioned on the encoder memory; "
              "a stalled overfit is an optimization/operating-point issue")


if __name__ == "__main__":
    main()
