#!/usr/bin/env python
"""Trained-weights decode rehearsal (VERDICT r4 item 3).

Completes the loop the reference calls evaluation
(/root/reference/src/inference/avsr_inference.py:366-517): take the CONVERGED
flagship checkpoint from the on-device overfit (train -> top-K average ->
beam decode -> WER, scripts/overfit_flagship.sh), export the averaged weights
through the production ``utils/torch_compat.export_torch_state_dict``
translation, decode the same utterances with the INDEPENDENT torch twin
(tests/torch_twins.TorchAVSRFlagship) driving the INDEPENDENT Python
reference beam (tests/test_beam_reference.python_reference_beam), and compare
hypotheses + WER against the framework's own jitted beam output
(measurements/r5/overfit/overfit.inf).

Two fully independent numeric stacks (JAX bf16 TPU fused kernels vs torch
f32 CPU + numpy DP) must transcribe a trained model identically — the
strongest no-silent-decode-bug statement available without real LRS2 assets.

Runs on CPU; no TPU required. Exit nonzero on any mismatch.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scratch", default="/tmp/overfit_flagship_r5")
    ap.add_argument("--art", default="measurements/r5/parity")
    ap.add_argument("--inf", default="measurements/r5/overfit/overfit.inf")
    ap.add_argument("--limit", type=int, default=0,
                    help="decode only the first N utterances (0 = all)")
    ap.add_argument("--merge", default="learned_ave",
                    help="fusion merge_method the checkpoint was trained "
                         "with (learned_ave | concat)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    import tests.test_beam_reference as refbeam
    from tailored_avsr_tpu.data import (
        AVSRDataLoader, AVSRDataset, get_tokenizer_converter,
    )
    from tailored_avsr_tpu.data.transforms_audio import AddNoise, Compose
    from tailored_avsr_tpu.data.transforms_video import CenterCrop, Normalise
    from tailored_avsr_tpu.decode.beam_search import BeamSearchConfig
    from tailored_avsr_tpu.evaluation import compute_bootstrap_wer, write_inf_file
    from tailored_avsr_tpu.tasks import AVSRTask
    from tailored_avsr_tpu.train.checkpoint import load_model
    from tailored_avsr_tpu.utils import load_config
    from tailored_avsr_tpu.utils.torch_compat import export_torch_state_dict
    from tests.torch_twins import TorchAVSRFlagship

    os.makedirs(args.art, exist_ok=True)

    cfg = load_config("configs/AVSR/tailored_transformer+ctc_spanish_tpu.yaml")
    cfg.dtype = "float32"
    # CPU rehearsal: the Pallas flash kernels only lower on TPU
    cfg.encoder_conf = dict(cfg.encoder_conf, use_flash=False)
    cfg.audiovisual_fusion_conf = dict(
        getattr(cfg, "audiovisual_fusion_conf", {}), merge_method=args.merge
    )
    tokenizer, converter = get_tokenizer_converter(cfg)
    token_list = converter.token_list
    vocab = len(token_list)
    model = AVSRTask.build_model(cfg, token_list)

    # template init (small shapes; params are shape-independent)
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    template = model.init(
        {"params": rng, "mlm": rng},
        jnp.zeros((1, 640 * 4), jnp.float32), jnp.full((1,), 640 * 4, jnp.int32),
        jnp.zeros((1, 4, 88, 88), jnp.float32), jnp.full((1,), 4, jnp.int32),
        jnp.ones((1, 3), jnp.int32), jnp.full((1,), 3, jnp.int32),
    )
    ckpt = os.path.join(args.scratch, "exp", "models", "model_average.ckpt")
    variables = load_model(
        {"params": template["params"], "batch_stats": template["batch_stats"]},
        ckpt,
    )
    print(f"loaded averaged checkpoint: {ckpt}")

    # the production weight translation -> the independent torch twin
    tw = TorchAVSRFlagship(vocab=vocab, fusion_merge=args.merge).eval()
    sd = export_torch_state_dict(variables)
    missing, unexpected = tw.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, f"unknown keys: {unexpected[:5]}"
    bad = [m for m in missing if not m.endswith(".num_batches_tracked")]
    assert not bad, f"missing keys: {bad[:5]}"
    print(f"torch twin loaded ({len(sd)} tensors translated)")

    # the same eval pipeline avsr_main uses (build_transforms eval path)
    mean, std = 0.421, 0.165
    loader = AVSRDataLoader(
        AVSRDataset(os.path.join(args.scratch, "corpus", "split.csv"),
                    task="avsr", is_training=False),
        1, task="avsr",
        audio_transforms=Compose([AddNoise(noise=None, snr_target=9999)]),
        video_transforms=Compose([
            Normalise(0.0, 250.0), Normalise(mean, std), CenterCrop((88, 88)),
        ]),
        tokenizer=tokenizer, converter=converter, is_training=False,
    )

    inf_conf = dict(cfg.inference_conf)
    beam_cfg = BeamSearchConfig(
        beam_size=int(inf_conf.get("beam_size", 10)),
        ctc_weight=float(inf_conf.get("ctc_weight", 0.1)),
        lm_weight=0.0,  # the overfit decode ran without an LM
        penalty=float(inf_conf.get("penalty", 0.0)),
        maxlenratio=float(inf_conf.get("maxlenratio", 0.0)),
        minlenratio=float(inf_conf.get("minlenratio", 0.0)),
        nbest=1,
    )
    # generalize the tiny-model reference beam to the flagship vocab: eos ==
    # <sos/eos> == last token, blank == 0 (espnet convention)
    refbeam.V, refbeam.SOS = vocab, vocab - 1

    pairs = []
    n_done = 0
    for batch in loader:
        audio = np.asarray(batch["audio"], np.float32)
        alens = np.asarray(batch["audio_lengths"], np.int64)
        video = np.asarray(batch["video"], np.float32)
        vlens = np.asarray(batch["video_lengths"], np.int64)
        with torch.no_grad():
            memory, mem_lens, _ = tw.encode(
                torch.from_numpy(audio), torch.from_numpy(alens),
                torch.from_numpy(video), torch.from_numpy(vlens),
            )
            ctc_logp = torch.log_softmax(
                tw.ctc.ctc_lo(memory), dim=-1
            )[0].numpy()
            enc_len = int(mem_lens[0])
            mem_mask = (
                torch.arange(memory.shape[1])[None, :]
                < mem_lens[:, None]
            )

        def att_fn(ys, pos):
            p = int(pos)
            ys_t = torch.from_numpy(np.asarray(ys)[:, :p]).long()
            with torch.no_grad():
                logits = tw.decoder(
                    ys_t, torch.tensor([p] * ys_t.shape[0]), memory, mem_mask
                )
            return torch.log_softmax(logits[:, p - 1], dim=-1).numpy()

        lmax = max(2, enc_len)
        hyps = refbeam.python_reference_beam(
            att_fn, ctc_logp, enc_len, beam_cfg, lmax
        )
        ids = hyps[0][0][1:-1] if hyps else []  # strip sos ... eos
        text = "".join(
            token_list[i] if token_list[i] != "<space>" else " " for i in ids
        )
        pairs.append((batch["refs"][0], text))
        n_done += 1
        if args.limit and n_done >= args.limit:
            break

    torch_inf = os.path.join(args.art, "torch_twin.inf")
    write_inf_file(torch_inf, pairs)
    wer_t, cer_t, ciw, cic = compute_bootstrap_wer(torch_inf)
    print(f"torch-twin decode: WER {wer_t:.2f} CER {cer_t:.2f} ({n_done} utts)")

    # compare with the framework's own on-device beam output
    ours = {}
    with open(args.inf) as f:
        for line in f:
            ref, hyp = line.rstrip("\n").split("#", 1)
            ours[ref.strip()] = hyp.strip()
    mismatches = []
    for ref, hyp in pairs:
        mine = ours.get(ref.strip())
        if mine is None:
            mismatches.append((ref, "<missing from ours>", hyp))
        elif mine != hyp.strip():
            mismatches.append((ref, mine, hyp))
    report = {
        "utterances": n_done,
        "torch_wer": wer_t, "torch_cer": cer_t,
        "hypothesis_mismatches": len(mismatches),
        "examples": mismatches[:5],
    }
    with open(os.path.join(args.art, "parity.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report)[:600])
    if mismatches:
        print(f"PARITY REHEARSAL FAILED: {len(mismatches)} hypothesis "
              "mismatches", file=sys.stderr)
        sys.exit(1)
    print("PARITY REHEARSAL OK: identical hypotheses, "
          f"WER {wer_t:.2f}")


if __name__ == "__main__":
    main()
