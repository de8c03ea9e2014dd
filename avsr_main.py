#!/usr/bin/env python
"""CLI train/inference driver — public-API mirror of the reference's
/root/reference/avsr_main.py (same flags, modes, epoch loop behavior,
top-K checkpoint averaging, .inf/.wer outputs), built on the TPU-native
framework: jitted train/eval steps, batched jitted beam search, and
data-parallel training over a device mesh (training_settings
`data_parallel: true` — params replicate, batches shard over 'data', XLA
inserts the gradient all-reduce; inference_conf `data_parallel: true` does
the same for decoding).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tailored_avsr_tpu.data import (
    AVSRDataLoader,
    AVSRDataset,
    get_tokenizer_converter,
)
from tailored_avsr_tpu.data.dataset import load_wav
from tailored_avsr_tpu.data.transforms_audio import (
    AddNoise,
    Compose,
    SpeedRate,
)
from tailored_avsr_tpu.data.transforms_video import (
    CenterCrop,
    HorizontalFlip,
    Normalise,
    QuantizeUint8,
    RandomCrop,
)
from tailored_avsr_tpu.data.transforms_video import TimeMasking as VideoTimeMasking
from tailored_avsr_tpu.decode.greedy import ctc_greedy_collapse
from tailored_avsr_tpu.evaluation import compute_bootstrap_wer, write_inf_file
from tailored_avsr_tpu.evaluation.wer import cer_from_ids
from tailored_avsr_tpu.inference import Speech2Text
from tailored_avsr_tpu.tasks import ASRTask, AVSRTask
from tailored_avsr_tpu.train import (
    average_models,
    create_train_state,
    freeze_mask,
    load_e2e,
    make_eval_step,
    make_train_step,
    save_model,
    save_val_stats,
    set_optimizer,
)
from tailored_avsr_tpu.train.checkpoint import top_k_epochs
from tailored_avsr_tpu.utils import load_config, security_checks

BATCH_KEYS = {
    "asr": ("speech", "speech_lengths", "text", "text_lengths"),
    "vsr": ("speech", "speech_lengths", "text", "text_lengths"),
    "avsr": ("audio", "audio_lengths", "video", "video_lengths", "text", "text_lengths"),
}


def batch_tuple(batch, task, mask="none"):
    arrs = [jnp.asarray(batch[k]) for k in BATCH_KEYS[task]]
    if task == "avsr" and mask == "audio":
        arrs[0] = arrs[0] * 0.0
    if task == "avsr" and mask == "video":
        arrs[2] = arrs[2] * 0.0
    return tuple(arrs)


def collapse_refs(text, text_lengths):
    return [list(t[:l]) for t, l in zip(np.asarray(text), np.asarray(text_lengths))]


def run_training(args, config, tokenizer, converter, transforms):
    task = config.task
    token_list = converter.token_list
    task_cls = AVSRTask if task == "avsr" else ASRTask
    model = task_cls.build_model(config, token_list)
    ts = config.training_settings

    def loader(path, is_training, audio_tf, video_tf):
        ds = AVSRDataset(
            path, task=task,
            nframes_limit=ts.get("nframes") if is_training else None,
            is_training=is_training,
        )
        return AVSRDataLoader(
            ds, ts["batch_size"], task=task,
            audio_transforms=audio_tf, video_transforms=video_tf,
            tokenizer=tokenizer, converter=converter, is_training=is_training,
            workers=int(ts.get("num_workers", 0) or 0),
        )

    train_loader = loader(args.training_dataset, True, transforms["train_audio"], transforms["train_video"])
    val_loader = loader(args.validation_dataset, False, transforms["eval_audio"], transforms["eval_video"])
    test_loader = loader(args.test_dataset, False, transforms["eval_audio"], transforms["eval_video"])

    # init params from the first batch's shapes
    rng = jax.random.PRNGKey(int(ts.get("seed", 0)))
    first = next(iter(train_loader))
    init_batch = batch_tuple(first, task)
    variables = model.init({"params": rng, "mlm": rng}, *init_batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"model parameters: {n_params / 1e6:.1f}M")

    init_scheme = getattr(config, "init", None)
    if init_scheme:
        from tailored_avsr_tpu.utils.initialize import initialize

        variables = initialize(variables, init_scheme)
        print(f"re-initialized parameters with {init_scheme}")
    if args.load_checkpoint:
        variables = load_e2e(variables, args.load_checkpoint, args.load_modules)
    frozen = None
    if args.freeze_modules and args.freeze_modules != ["no-frozen"]:
        frozen = freeze_mask(variables["params"], args.freeze_modules)

    tx, _ = set_optimizer(ts, model_size=int(
        (getattr(config, "encoder_conf", {}) or {}).get("output_size", 256)
    ), steps_per_epoch=len(train_loader), frozen_mask=frozen)
    state = create_train_state(variables, tx)
    # mixed precision: top-level `dtype: bfloat16` or the reference's
    # training_settings `use_amp: true` (ref avsr_main.py:215 gates a cuda
    # GradScaler on it; bf16 compute with f32 master params is the TPU form
    # — no loss scaling needed, bf16 has f32's exponent range)
    compute_dtype = (
        jnp.bfloat16 if str(getattr(config, "dtype", "float32")) in
        ("bfloat16", "bf16") or bool(ts.get("use_amp", False)) else None
    )
    train_step = make_train_step(
        model, tx, compute_dtype=compute_dtype,
        remat=bool((ts or {}).get("remat", False)),
    )
    eval_step = make_eval_step(model)

    mesh = None
    model_par = int(ts.get("model_parallel", 1))
    if (
        bool(ts.get("data_parallel", False)) or model_par > 1
    ) and jax.device_count() > 1:
        from tailored_avsr_tpu.parallel.mesh import make_mesh, shard_train_state

        if jax.device_count() % max(model_par, 1):
            raise ValueError(
                f"training_settings model_parallel={model_par} must divide "
                f"the device count ({jax.device_count()})"
            )
        mesh = make_mesh(model_parallel=model_par)
        # model_parallel == 1 degenerates to replicated params (plain DP);
        # > 1 shards FFN/cgMLP/attention-projection kernels and their Adam
        # moments over 'model' (parallel/mesh.py tp_param_spec)
        state = shard_train_state(state, mesh)
        print(f"training mesh: {dict(mesh.shape)}")

    def place_batch(bt):
        if mesh is None:
            return bt
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        spec = P("data") if bt[0].shape[0] % n_data == 0 else P()
        sh = NamedSharding(mesh, spec)
        return tuple(jax.device_put(a, sh) for a in bt)

    def run_train_step(state, bt, rng):
        if mesh is None:
            return train_step(state, bt, rng)
        with mesh:
            return train_step(state, place_batch(bt), rng)

    def run_eval_step(state, bt):
        if mesh is None:
            return eval_step(state, bt)
        with mesh:
            return eval_step(state, place_batch(bt))

    def validation(loader):
        tot_loss, n, refs, hyps = 0.0, 0, [], []
        for batch in loader:
            out = run_eval_step(state, batch_tuple(batch, task))
            tot_loss += float(out["loss"])
            n += 1
            hyp_ids = ctc_greedy_collapse(
                np.asarray(out["ctc_argmax"]), np.asarray(out["ctc_argmax_lens"])
            )
            refs.extend(collapse_refs(batch["text"], batch["text_lengths"]))
            hyps.extend(hyp_ids)
        cer = cer_from_ids(refs, hyps)
        return tot_loss / max(n, 1), cer

    os.makedirs(os.path.join(args.output_dir, "models"), exist_ok=True)
    from tailored_avsr_tpu.train.checkpoint import load_train_state, save_train_state

    ts_path = os.path.join(args.output_dir, "models", "train_state.ckpt")
    start_epoch = 1
    if args.resume and os.path.exists(ts_path):
        state, done_epoch = load_train_state(state, ts_path)
        start_epoch = done_epoch + 1
        print(f"resumed training state after epoch {done_epoch} (step {int(state.step)})")
    val_stats = []  # rows with saved checkpoints (averaging candidates)
    all_val_rows = []  # every epoch's validation CER (val_stats.csv)
    save_every = max(1, int(ts.get("save_every", 1) or 1))
    save_state_every = max(1, int(ts.get("save_state_every", save_every) or 1))
    # preemption handling (SURVEY.md §5.3-5.4 — the reference has none):
    # SIGTERM/SIGINT stop the run at the next step or epoch boundary. The
    # recovery unit is the per-epoch train_state.ckpt already on disk, so the
    # partial epoch is simply abandoned — `--resume` re-trains it exactly
    # once from the last completed epoch (exactly-once epoch semantics; no
    # optimizer-step double counting, schedules stay consistent).
    import signal

    stop_requested = {"flag": False}

    def _on_term(signum, frame):
        if stop_requested["flag"] and signum == signal.SIGINT:
            raise KeyboardInterrupt  # second Ctrl-C: stop NOW
        stop_requested["flag"] = True
        print(
            f"\nsignal {signum}: finishing the current step, then exiting "
            "(state through the last completed epoch is on disk; --resume "
            "re-trains the interrupted epoch; Ctrl-C again to abort "
            "immediately)"
        )

    old_handlers = {
        s: signal.signal(s, _on_term) for s in (signal.SIGTERM, signal.SIGINT)
    }
    print("\nTRAINING PHASE\n")
    try:
        for epoch in range(start_epoch, ts["epochs"] + 1):
            t0 = time.time()
            tot, n = 0.0, 0
            parts = {}  # loss_att / loss_ctc / acc breakdown (when present)
            for batch in train_loader:
                state, stats = run_train_step(state, batch_tuple(batch, task), rng)
                tot += float(stats["loss"])
                for k in ("loss_att", "loss_ctc", "acc"):
                    if k in stats:
                        parts[k] = parts.get(k, 0.0) + float(stats[k])
                fw = stats.get("fusion_weights")
                if fw and "acoustic_weight" in fw:
                    # mean gate weight — a slammed gate (≈0 or ≈1 on the wrong
                    # branch) is the modality-collapse signature
                    parts["aw"] = parts.get("aw", 0.0) + float(
                        jnp.mean(fw["acoustic_weight"])
                    )
                n += 1
                if stop_requested["flag"]:
                    break
            if stop_requested["flag"]:
                print(
                    f"preempted during epoch {epoch} after {n} steps: "
                    f"abandoning the partial epoch; rerun with --resume "
                    f"(restarts at epoch {epoch})"
                )
                return False
            train_loss = tot / max(n, 1)
            val_loss, val_cer = validation(val_loader)
            test_loss, test_cer = validation(test_loader)
            detail = "".join(
                f" {k.removeprefix('loss_').upper()}={v / max(n, 1):.3f}"
                for k, v in sorted(parts.items())
            )
            print(
                f"Epoch {epoch}: TRAIN LOSS={train_loss:.3f}{detail} || "
                f"VAL LOSS={val_loss:.3f} "
                f"| VAL CER={val_cer:.2f}% || TEST LOSS={test_loss:.3f} "
                f"| TEST CER={test_cer:.2f}% || {time.time() - t0:.1f}s"
            )
            all_val_rows.append({"epoch": epoch, "cer": val_cer})
            # Checkpoint cadence: the reference saves every epoch (its device
            # is local, ref avsr_main.py:222); over a remote-tunnel TPU a
            # device_get of the 59M-param model + optimizer state costs
            # minutes (measured ~5 MB/s device->host), so the save interval
            # is a training_settings knob. save_every gates the averaging
            # checkpoints, save_state_every the (3x larger) resume state.
            # Defaults (1) are reference parity.
            last_epoch = epoch == ts["epochs"] or stop_requested["flag"]
            if epoch % save_every == 0 or last_epoch:
                ckpt = os.path.join(
                    args.output_dir, "models", f"model_{epoch:03d}.ckpt"
                )
                save_model(
                    {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)},
                    ckpt,
                )
                val_stats.append({"epoch": epoch, "cer": val_cer, "path": ckpt})
                keep = int(ts.get("keep_checkpoints", 0) or 0)
                if keep:
                    from tailored_avsr_tpu.train.checkpoint import (
                        prune_checkpoints,
                    )

                    # never prune below what the final top-K averaging needs
                    prune_checkpoints(val_stats, max(keep, ts["average_epochs"]))
            if epoch % save_state_every == 0 or last_epoch:
                save_train_state(state, epoch, ts_path)
            if stop_requested["flag"]:  # signal arrived during validation/save
                print(
                    f"preempted after epoch {epoch} completed: state saved; "
                    "rerun with --resume to continue"
                )
                return False
    finally:
        for s, h in old_handlers.items():
            signal.signal(s, h)

    save_val_stats(
        os.path.join(args.output_dir, "val_stats.csv"),
        [{"epoch": r["epoch"], "cer": r["cer"]} for r in all_val_rows],
    )
    best = top_k_epochs(val_stats, ts["average_epochs"])
    paths = [os.path.join(args.output_dir, "models", f"model_{e:03d}.ckpt") for e in best]
    template = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    avg = average_models(template, paths)
    save_model(avg, os.path.join(args.output_dir, "models", "model_average.ckpt"))
    print(f"averaged top-{len(paths)} checkpoints -> model_average.ckpt")
    return True


def run_inference(args, config, tokenizer, converter, transforms):
    print("\nINFERENCE PHASE\n")
    task = config.task
    lm_config = load_config(args.lm_config_file) if args.lm_config_file else None
    s2t = Speech2Text(
        config,
        ckpt_path=args.load_checkpoint or None,
        lm_config=lm_config,
        lm_ckpt_path=args.load_lm or None,
        ngram_path=args.ngram_file or None,
    )
    ds = AVSRDataset(args.test_dataset, task=task, is_training=False)
    inf_conf = dict(getattr(config, "inference_conf", {}) or {})
    inf_batch = int(inf_conf.get("batch_size", 1))
    video_tf = transforms["eval_video"]
    if bool(inf_conf.get("device_normalize", False)):
        # keep the video uint8 through the host pipeline (crop commutes with
        # the affine normalization) — 4x less host->device transfer; the
        # Speech2Text jit graph applies Normalise(0,250)+Normalise(mean,std)
        # on device (inference.py _dequantize)
        video_tf = Compose([CenterCrop((88, 88)), QuantizeUint8()])
    loader = AVSRDataLoader(
        ds, inf_batch, task=task,
        audio_transforms=transforms["eval_audio"],
        video_transforms=video_tf,
        tokenizer=tokenizer, converter=converter, is_training=False,
        workers=int((getattr(config, "training_settings", {}) or {})
                    .get("num_workers", 0) or 0),
    )
    def masked_batches():
        for batch in loader:
            if task == "avsr" and args.mask == "audio":
                batch["audio"] = batch["audio"] * 0.0
            if task == "avsr" and args.mask == "video":
                batch["video"] = batch["video"] * 0.0
            yield batch

    pairs = []
    n_best = int(inf_conf.get("nbest", 1))
    nbest_rows = []  # (sample_idx, rank, text, score) when n_best > 1
    t0 = time.time()
    profiling = bool(args.profile_dir)
    if profiling:
        import jax.profiler

        jax.profiler.start_trace(args.profile_dir)
    # s2t.stream double-buffers the host->device input transfer under the
    # decode compute (the naive per-batch loop is transfer-bound; see
    # Speech2Text.stream)
    for batch, results in s2t.stream(masked_batches(), nbest=n_best > 1):
        if profiling:  # trace covers the first (compile+decode) batch
            jax.profiler.stop_trace()
            profiling = False
            print(f"wrote profiler trace to {args.profile_dir}")
        for ref, hyp in zip(batch["refs"], results):
            if n_best > 1:
                text = hyp[0][0]
                for rank, (htext, _, _, score) in enumerate(hyp):
                    nbest_rows.append((len(pairs), rank + 1, htext, score))
            else:
                text = hyp[0]
            pairs.append((ref, text))
            print(f"REF: {ref}\nHYP: {text}\n")
    dt = time.time() - t0
    os.makedirs(os.path.join(args.output_dir, "inference"), exist_ok=True)
    inf_path = os.path.join(args.output_dir, "inference", args.output_name + ".inf")
    write_inf_file(inf_path, pairs)
    if n_best > 1:
        # espnet-style nbest dirs: <out>/inference/<name>_nbest/<k>best_recog/
        # {text,score} (the reference CLI's DatadirWriter layout,
        # src/inference/avsr_inference.py:663-717)
        for rank in range(1, n_best + 1):
            d = os.path.join(
                args.output_dir, "inference", args.output_name + "_nbest",
                f"{rank}best_recog",
            )
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "text"), "w") as ft, open(
                os.path.join(d, "score"), "w"
            ) as fs:
                for idx, r, text, score in nbest_rows:
                    if r == rank:
                        ft.write(f"utt{idx:06d} {text}\n")
                        fs.write(f"utt{idx:06d} {score:.4f}\n")
    wer, cer, ci_w, ci_c = compute_bootstrap_wer(inf_path)
    with open(os.path.join(args.output_dir, "inference", args.output_name + ".wer"), "w") as f:
        f.write(f"WER: {wer:.2f} +- {ci_w:.2f}\nCER: {cer:.2f} +- {ci_c:.2f}\n")
    print(f"%WER {wer:.2f} ± {ci_w:.2f} | %CER {cer:.2f} ± {ci_c:.2f} | {dt:.1f}s")


def build_transforms(args):
    mean, std = 0.421, 0.165
    if args.noise and not os.path.exists(args.noise):
        raise FileNotFoundError(
            f"--noise {args.noise!r} not found (shipped assets: assets/noise/)"
        )
    noise = load_wav(args.noise) if args.noise else None
    return {
        "train_audio": Compose([SpeedRate(sample_rate=16000)]),
        "eval_audio": Compose(
            [AddNoise(noise=noise, snr_target=args.snr_target)]
        ),
        "train_video": Compose([
            Normalise(0.0, 250.0),
            Normalise(mean, std),
            VideoTimeMasking(),
            RandomCrop((88, 88)),
            HorizontalFlip(0.5),
        ]),
        "eval_video": Compose([
            Normalise(0.0, 250.0),
            Normalise(mean, std),
            CenterCrop((88, 88)),
        ]),
    }


def get_parser():
    parser = argparse.ArgumentParser(
        description="Automatic Audio-Visual Speech Recognition System (TPU-native).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--training-dataset", default="", type=str)
    parser.add_argument("--validation-dataset", default="", type=str)
    parser.add_argument("--test-dataset", default="", type=str)
    parser.add_argument("--mode", default="both", type=str,
                        help="'training', 'inference' or 'both'")
    parser.add_argument("--mask", default="none", type=str,
                        help="'audio', 'video' or 'none'")
    parser.add_argument("--snr-target", default=9999, type=int)
    parser.add_argument("--noise", default="", type=str)
    parser.add_argument("--config-file", required=True, type=str)
    parser.add_argument("--load-checkpoint", default="", type=str)
    parser.add_argument("--lm-config-file", default="", type=str)
    parser.add_argument("--load-lm", default="", type=str)
    parser.add_argument("--ngram-file", default="", type=str,
                        help="ARPA n-gram LM for shallow fusion")
    parser.add_argument("--profile-dir", default="", type=str,
                        help="write a jax.profiler trace of the first "
                             "inference batch to this directory")
    parser.add_argument("--resume", action="store_true",
                        help="resume from <output-dir>/models/train_state.ckpt")
    parser.add_argument("--load-modules", nargs="+", default=["entire-e2e"], type=str)
    parser.add_argument("--freeze-modules", nargs="+", default=["no-frozen"], type=str)
    parser.add_argument("--yaml-overrides", metavar="CONF:KEY:VALUE", nargs="*")
    parser.add_argument("--output-dir", required=True, type=str)
    parser.add_argument("--output-name", required=True, type=str)
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)
    config = load_config(args.config_file, args.yaml_overrides)
    security_checks(config)
    tokenizer, converter = get_tokenizer_converter(config)
    transforms = build_transforms(args)
    if args.mode in ("training", "both"):
        completed = run_training(args, config, tokenizer, converter, transforms)
        if not completed:
            print("training was preempted: skipping the inference phase")
            return
        if args.mode == "both" and not args.load_checkpoint:
            args.load_checkpoint = os.path.join(
                args.output_dir, "models", "model_average.ckpt"
            )
    if args.mode in ("inference", "both"):
        run_inference(args, config, tokenizer, converter, transforms)


if __name__ == "__main__":
    main()
