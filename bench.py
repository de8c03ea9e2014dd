#!/usr/bin/env python
"""Benchmark: batched AVSR inference real-time factor on the flagship tailored
model (256-d, 12-block tailored audio-visual Branchformer, the reference's
headline config) on whatever accelerator JAX sees (TPU chip under the driver).

Prints one JSON line PER STAGE — greedy CTC decode, joint CTC/attention + LM
beam decode (the WER-parity path), and a training step (loss+grads+AdamW) —
each: {"metric", "value", "unit", "vs_baseline", plus measured perf-accounting
fields "flops_per_utt", "tf_per_sec", "mfu_pct"}. All three run by DEFAULT
(the driver invokes plain ``python bench.py``); ``--greedy-only`` restricts to
the first for quick checks.

Failure is structured, never a bare traceback: if the backend cannot
initialize (the TPU tunnel has been observed to hang indefinitely), or a stage
dies or exceeds the global ``--deadline``, the stage's line is emitted with an
``"error"`` field and value null — a failed round still produces a parseable
artifact for every stage.

Metric: real-time factor = audio-seconds transcribed per wall second per chip.
The reference repo publishes no RTF numbers (BASELINE.md); the north-star is
>=5x an A100 PyTorch baseline. A100 PyTorch inference of comparable
espnet-class AVSR stacks runs around ~30x real time at batch 1; vs_baseline
reports value / (5 * 30) — progress toward the 5x-A100 target under that
stand-in until a measured A100 number exists.

MFU: FLOPs are XLA's own cost analysis of the exact compiled graph
(compiled.cost_analysis()['flops']) divided by measured wall time and the
chip's peak dense bf16 throughput (TPU v5e = 197 TF/s).

Timing fetches the result every iteration (np.asarray): on some transports
(the axon tunnel) block_until_ready returns before execution finishes, so
fetch-free timing over-reports throughput.

Tuning: if ``bench_tuning.json`` exists next to this file (written by
scripts/tpu_day.sh from the on-device sweep + kernel-probe results), its
``beam_batch`` / ``fused_group_attend`` / ``phase_widths`` become the beam
stage's defaults — so the driver's plain ``python bench.py`` capture lands on
the measured-best operating point, and never times a Pallas kernel that
failed its compiled numerics probe. Explicit CLI flags still win.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

# persistent compiled-executable cache: the flagship graphs cost 10-25 min
# each through the axon remote-compile path, ~2 min on a cache hit. The same
# directory is used by every scripts/ CLI (scripts/_pathfix.py), so a driver
# bench run after an evidence day starts from warm compiles. Set before the
# first jit; jax reads the env var lazily at first compile.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_r5")
try:
    os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
except OSError:
    pass

# peak dense-matmul throughput per chip, bf16 (TF/s)
PEAK_TFLOPS = {
    "v5 lite": 197.0,  # TPU v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6": 918.0,  # Trillium
}

STAGES = (
    "avsr_inference_rtf_greedy_batch128_bf16",
    "avsr_beam10_lm_rtf_bf16",
    "avsr_train_step_rtf_batch16",
)

_emitted: set = set()
_emit_lock = threading.Lock()


def emit(metric: str, **fields) -> None:
    with _emit_lock:
        if metric in _emitted:
            return
        _emitted.add(metric)
        line = {"metric": metric, "value": None, "unit": "x_realtime_per_chip",
                "vs_baseline": None}
        line.update(fields)
        print(json.dumps(line), flush=True)


def emit_error(metric: str, err: str) -> None:
    emit(metric, error=err)


def peak_for(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, tf in PEAK_TFLOPS.items():
        if key in kind:
            return tf
    return None


def graph_flops(jitted, *args) -> float | None:
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops")) if ca and "flops" in ca else None
    except Exception:
        return None


def timed(fn, *args, iters=10):
    """min wall time with honest result fetch (see module docstring)."""
    for attempt in range(3):  # the remote tunnel can drop transiently
        try:
            out = fn(*args)
            np.asarray(jax_leaves(out)[0])
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(10)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def jax_leaves(tree):
    import jax

    return [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "shape")]


def perf_fields(flops, dt, peak_tf, batch):
    out = {}
    if flops:
        tf_s = flops / dt / 1e12
        out["flops_per_utt"] = round(flops / batch / 1e9, 2)  # GFLOPs
        out["tf_per_sec"] = round(tf_s, 1)
        if peak_tf:
            out["mfu_pct"] = round(100.0 * tf_s / peak_tf, 1)
    return out


def init_backend(timeout_s: float, stages=STAGES):
    """Initialize the JAX backend under a watchdog.

    The axon tunnel's backend init has been observed to hang for 40+ minutes
    before dying (BENCH_r02); probing in a daemon thread bounds the wait and
    turns the hang into a structured record.
    """
    result = {}

    def probe():
        try:
            import jax

            # this image's sitecustomize pre-imports jax pinned to the axon
            # tunnel; honor an explicit JAX_PLATFORMS override (the env var
            # alone is ignored once the config is set) so CPU dress
            # rehearsals (--tiny) actually run on CPU
            want = os.environ.get("JAX_PLATFORMS")
            if want and jax.config.jax_platforms != want:
                jax.config.update("jax_platforms", want)
            result["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report whatever init raised
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in result:
        err = result.get(
            "error", f"tpu_unavailable: backend init exceeded {timeout_s:.0f}s"
        )
        for metric in stages:
            emit_error(metric, err)
        os._exit(0)  # the hung init thread cannot be joined
    return result["devices"]


def load_tuning() -> dict:
    """Best-measured operating point from scripts/tpu_day.sh (optional)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_tuning.json")
    try:
        with open(path) as f:
            tuning = json.load(f)
        return tuning if isinstance(tuning, dict) else {}
    except Exception:
        return {}


def bench_greedy(model_pack, metric: str):
    import jax
    import jax.numpy as jnp

    (variables, model, on_tpu, peak_tf, audio, alens, video, vlens,
     samples) = model_pack

    @jax.jit
    def infer(audio, alens, video, vlens):
        return model.apply(
            variables, audio, alens, video, vlens, method="ctc_greedy"
        )

    batch = audio.shape[0]
    dt = timed(infer, audio, alens, video, vlens)
    flops = graph_flops(infer, audio, alens, video, vlens)
    rtf = batch * samples / 16000.0 / dt
    emit(metric, value=round(rtf, 2), vs_baseline=round(rtf / 150.0, 3),
         **perf_fields(flops, dt, peak_tf, batch))


def probe_fused_kernels(timeout_s: float = 900.0):
    """Compiled numerics gate for the ancestry-beam Pallas kernels.

    CI runs the kernels in interpret mode inside the full beam graph, but
    Mosaic compilation is a different code path — never let the capture's
    beam number depend on an unverified compiled kernel. Runs
    scripts/probe_kernels_tpu.py (kernels vs NumPy oracles, compiled on this
    backend) in a SUBPROCESS so a slow or hung remote compile is killed at
    the deadline — an abandoned in-process thread would keep executing on
    the chip during the timed beam iterations and corrupt the capture.

    Returns (ok, note) — on any mismatch/exception/timeout the caller falls
    back to the XLA group-attend formulation (slower, equally exact).
    """
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "probe_kernels_tpu.py")
    try:
        r = subprocess.run(
            [sys.executable, script], capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe_timeout_{timeout_s:.0f}s"
    except Exception as e:  # noqa: BLE001 — any failure means fallback
        return False, f"{type(e).__name__}: {e}"
    if r.returncode == 0 and "KERNEL PROBE OK" in r.stdout:
        return True, "probe_ok"
    tail = (r.stdout + r.stderr).strip().splitlines()
    return False, "probe_failed: " + (tail[-1][:200] if tail else "no output")


def resolve_beam_tuning(args_cli, tuning: dict):
    """Merge CLI flags over bench_tuning.json: (beam_batch, conf_overrides)."""
    beam_batch = args_cli.beam_batch
    if beam_batch is None:
        beam_batch = int(tuning.get("beam_batch", 32))
    if args_cli.tiny:
        beam_batch = 2
    overrides = {}
    if "fused_group_attend" in tuning:
        overrides["fused_group_attend"] = bool(tuning["fused_group_attend"])
    for key in ("quantize_lm", "quantize_asr_model"):
        if key in tuning:
            overrides[key] = bool(tuning[key])
    if tuning.get("cache_protocol"):
        overrides["cache_protocol"] = str(tuning["cache_protocol"])
    if tuning.get("cache_dtype"):
        overrides["cache_dtype"] = str(tuning["cache_dtype"])
    if tuning.get("mem_dtype"):
        overrides["mem_dtype"] = str(tuning["mem_dtype"])
    if "unroll" in tuning:
        overrides["unroll"] = int(tuning["unroll"])
    beam_phases = args_cli.beam_phases or ",".join(
        str(x) for x in tuning.get("phase_widths") or []
    )
    if beam_phases:
        overrides["phase_widths"] = [float(x) for x in beam_phases.split(",")]
    return beam_batch, overrides


def bench_beam(args_cli, on_tpu, peak_tf, samples, metric: str):
    """Joint CTC/attention + LM beam decode — the WER-parity serving path."""
    from __graft_entry__ import _flagship_cfg
    from tailored_avsr_tpu.inference import Speech2Text
    from tailored_avsr_tpu.utils.config import load_config

    cfg = _flagship_cfg(tiny=args_cli.tiny)
    lm_cfg = load_config("configs/LM/lm-spanish.yaml")
    if args_cli.tiny:
        lm_cfg.lm_conf = dict(
            lm_cfg.lm_conf, att_unit=64, unit=96, head=2, layer=2
        )
    if on_tpu:
        cfg.dtype = "bfloat16"
        cfg.encoder_conf = dict(cfg.encoder_conf, use_flash=True)
    tuning = {} if args_cli.tiny else load_tuning()
    beam_batch, overrides = resolve_beam_tuning(args_cli, tuning)
    probe_note = "tuned" if "fused_group_attend" in overrides else None
    if on_tpu and not args_cli.tiny and probe_note is None:
        if os.environ.get("TAVSR_FUSED_GROUP_ATTEND") == "0":
            overrides["fused_group_attend"] = False
            probe_note = "env_disabled"
        else:
            # no sweep/probe verdict on record (bench_tuning.json absent):
            # gate the never-yet-compiled Pallas kernels in-process before
            # letting the capture's beam number depend on them
            ok, probe_note = probe_fused_kernels()
            if not ok:
                overrides["fused_group_attend"] = False
    cfg.inference_conf = dict(
        cfg.inference_conf, beam_size=10, ctc_weight=0.1, lm_weight=0.4,
        early_exit=False, **overrides,
    )
    s2t = Speech2Text(cfg, lm_config=lm_cfg)
    # generate exactly beam_batch rows — slicing the greedy pack would
    # silently decode fewer utterances than the RTF divides by whenever
    # beam_batch exceeds the greedy batch
    rng = np.random.RandomState(1)
    frames = samples // 640
    data = {
        "audio": (rng.randn(beam_batch, samples) * 0.1).astype(np.float32),
        "audio_lengths": np.full((beam_batch,), samples, np.int32),
        "video": rng.randn(beam_batch, frames, 88, 88).astype(np.float32),
        "video_lengths": np.full((beam_batch,), frames, np.int32),
        "text": np.ones((beam_batch, 8), np.int32),
        "text_lengths": np.full((beam_batch,), 8, np.int32),
    }
    data = s2t.device_put_batch(data)
    s2t._decode_arrays(data)  # compile
    bargs = s2t._shard_args(s2t._model_args(data))
    key = tuple((a.shape, str(a.dtype)) for a in bargs)
    bjit = s2t._decode_jit[key]
    dt_b = timed(bjit, s2t.variables, *bargs, iters=5)
    flops_b = graph_flops(bjit, s2t.variables, *bargs)
    rtf_b = beam_batch * samples / 16000.0 / dt_b
    extra = {"probe": probe_note} if probe_note else {}
    # non-default operating-point knobs must be visible in the record
    for knob in ("quantize_lm", "quantize_asr_model", "cache_protocol",
                 "cache_dtype", "mem_dtype", "phase_widths"):
        if knob in overrides:
            extra[knob] = overrides[knob]
    emit(metric, value=round(rtf_b, 2), vs_baseline=round(rtf_b / 150.0, 3),
         batch=beam_batch,
         fused=cfg.inference_conf.get("fused_group_attend"),
         **perf_fields(flops_b, dt_b, peak_tf, beam_batch), **extra)


def bench_train(on_tpu, peak_tf, metric: str, tiny: bool = False,
                train_batch: int | None = None):
    """Times the PRODUCT train step (train/loop.make_train_step): donated
    state buffers + bf16 mixed precision on TPU — the same jitted step
    avsr_main.py runs, not a bench-local re-derivation of it."""
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_flagship
    from tailored_avsr_tpu.train.loop import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.RandomState(7)
    tb, tframes = (2, 16) if tiny else (16, 100)
    tuning = {} if tiny else load_tuning()
    if train_batch is None and not tiny:
        train_batch = tuning.get("train_batch")
    if train_batch and not tiny:
        tb = int(train_batch)
    use_remat = bool(tuning.get("train_remat", False))
    tsamples = tframes * 640
    batch = (
        jnp.asarray(rng.randn(tb, tsamples).astype(np.float32) * 0.1),
        jnp.full((tb,), tsamples, np.int32),
        jnp.asarray(rng.randn(tb, tframes, 88, 88).astype(np.float32)),
        jnp.full((tb,), tframes, np.int32),
        jnp.asarray(rng.randint(3, 30, (tb, 30)), np.int32),
        jnp.full((tb,), 30, np.int32),
    )
    tmodel = _build_flagship(tiny=tiny, use_flash=False)
    tvars = tmodel.init(
        {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)},
        *(x[:2] for x in batch),
    )
    tx = optax.adamw(1e-3)
    step = make_train_step(
        tmodel, tx, donate=True, remat=use_remat,
        compute_dtype=jnp.bfloat16 if on_tpu else None,
    )
    key = jax.random.PRNGKey(3)

    def fresh_state():
        # the step donates the state pytree, so a failed-after-dispatch
        # attempt has consumed its buffers — every (re)try needs copies
        copied = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True) if hasattr(x, "dtype") else x,
            tvars,
        )
        return create_train_state(copied, tx)

    state = fresh_state()
    # cost analysis first: lowering only reads shapes, donation consumes
    # the state buffers at execution
    flops_t = graph_flops(step, state, batch, key)
    for attempt in range(3):  # the remote tunnel can drop transiently
        try:
            state, stats = step(state, batch, key)  # compile + step 1
            np.asarray(jax_leaves(stats)[0])
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(10)
            state = fresh_state()
    times = []
    for _ in range(5):  # donated state must thread through, not repeat
        t0 = time.perf_counter()
        state, stats = step(state, batch, key)
        np.asarray(jax_leaves(stats)[0])
        times.append(time.perf_counter() - t0)
    dt_t = min(times)
    rtf_t = tb * tsamples / 16000.0 / dt_t
    extra = {"batch": tb, "remat": use_remat,
             # one epoch of the reference's 818 h corpus (BASELINE.md) on
             # one chip at this throughput
             "epoch_hours_818h": round(818.0 / rtf_t, 2)}
    if flops_t:
        # A100-roofline stand-in: the same graph's measured FLOPs at an
        # A100's 312 TF/s dense bf16 and a generous 35% MFU (typical good
        # PyTorch training). Carries the same asterisk as the inference
        # stand-in (docs/DESIGN.md) until a real A100 run exists.
        flops_per_audio_s = flops_t / (tb * tsamples / 16000.0)
        a100_rtf = 312e12 * 0.35 / flops_per_audio_s
        extra["vs_baseline"] = round(rtf_t / a100_rtf, 3)
        extra["baseline_note"] = "a100_roofline_standin_312tf_35mfu"
    if not tiny:
        # training-envelope point (VERDICT r4 item 7): the corpus trains at
        # nframes<=500 (20 s utterances), not the 4 s bench point — measure
        # a long-frames step so the 818 h epoch projection reflects the real
        # envelope. Same per-step frame budget (batch x frames ~ const).
        try:
            tb5 = int(tuning.get("train_frames500_batch", 4))
            remat5 = bool(tuning.get("train_frames500_remat", use_remat))
            f5 = 500
            s5 = f5 * 640
            batch5 = (
                jnp.asarray(rng.randn(tb5, s5).astype(np.float32) * 0.1),
                jnp.full((tb5,), s5, np.int32),
                jnp.asarray(rng.randn(tb5, f5, 88, 88).astype(np.float32)),
                jnp.full((tb5,), f5, np.int32),
                jnp.asarray(rng.randint(3, 120, (tb5, 120)), np.int32),
                jnp.full((tb5,), 120, np.int32),
            )
            step5 = make_train_step(
                tmodel, tx, donate=True, remat=remat5,
                compute_dtype=jnp.bfloat16 if on_tpu else None,
            )
            state5 = fresh_state()
            flops5 = graph_flops(step5, state5, batch5, key)
            state5, stats5 = step5(state5, batch5, key)
            np.asarray(jax_leaves(stats5)[0])
            times5 = []
            for _ in range(3):
                t0 = time.perf_counter()
                state5, stats5 = step5(state5, batch5, key)
                np.asarray(jax_leaves(stats5)[0])
                times5.append(time.perf_counter() - t0)
            dt5 = min(times5)
            rtf5 = tb5 * s5 / 16000.0 / dt5
            extra["frames500"] = {
                "batch": tb5, "remat": remat5, "rtf": round(rtf5, 2),
                "epoch_hours_818h": round(818.0 / rtf5, 2),
                **perf_fields(flops5, dt5, peak_tf, tb5),
            }
        except Exception as e:  # noqa: BLE001 — envelope point is best-effort
            extra["frames500"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    emit(metric, value=round(rtf_t, 2),
         **perf_fields(flops_t, dt_t, peak_tf, tb), **extra)


def run_stages_isolated(args_cli, stages):
    """Run each stage in its own subprocess (fresh TPU context per stage).

    The r4 dress rehearsal showed why: the greedy stage's batch-128 arrays,
    bf16 params, and compiled executable stay resident in HBM, and the beam
    stage then OOMs at an operating point that succeeds standalone
    (measurements/r4/fusedday/bench.log vs fsweep.log). One process per
    stage makes the three captures independent — a stage can only be killed
    by its own footprint or timeout, never a predecessor's leftovers.
    """
    deadline = time.monotonic() + args_cli.deadline
    me = os.path.abspath(__file__)
    stage_names = {STAGES[0]: "greedy", STAGES[1]: "beam", STAGES[2]: "train"}
    forwarded = []
    if args_cli.tiny:
        forwarded.append("--tiny")
    if args_cli.beam_batch is not None:
        forwarded += ["--beam-batch", str(args_cli.beam_batch)]
    if args_cli.beam_phases:
        forwarded += ["--beam-phases", args_cli.beam_phases]
    if args_cli.train_batch is not None:
        forwarded += ["--train-batch", str(args_cli.train_batch)]
    forwarded += ["--backend-timeout", str(args_cli.backend_timeout)]
    for metric in stages:
        budget = deadline - time.monotonic()
        if budget < 60:
            emit_error(metric, f"deadline_exceeded_{args_cli.deadline:.0f}s")
            continue
        cmd = [sys.executable, me, "--stage", stage_names[metric],
               "--deadline", str(max(60.0, budget - 30.0))] + forwarded
        try:
            r = subprocess.run(
                cmd, capture_output=True, text=True, timeout=budget,
            )
        except subprocess.TimeoutExpired:
            emit_error(metric, f"stage_timeout_{budget:.0f}s")
            continue
        got_line = False
        for line in r.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("metric") == metric:
                    with _emit_lock:
                        _emitted.add(metric)
                    print(line, flush=True)
                    got_line = True
        if not got_line:
            tail = (r.stdout + r.stderr).strip().splitlines()
            emit_error(
                metric,
                f"stage_exit_{r.returncode}: "
                + (tail[-1][:200] if tail else "no output"),
            )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--full", action="store_true",
        help="deprecated no-op: beam+LM and train stages run by default",
    )
    parser.add_argument(
        "--greedy-only", action="store_true",
        help="bench only the greedy CTC decode (quick check)",
    )
    parser.add_argument(
        "--stage", choices=["greedy", "beam", "train"], default=None,
        help="run ONE stage in-process (used by the per-stage subprocess "
             "isolation; plain `python bench.py` orchestrates all three)",
    )
    parser.add_argument(
        "--beam-batch", type=int, default=None,
        help="batch size for the beam-decode bench (default: "
             "bench_tuning.json's beam_batch if present, else 32)",
    )
    parser.add_argument(
        "--train-batch", type=int, default=None,
        help="batch size for the train-step bench (default: "
             "bench_tuning.json's train_batch if present, else 16)",
    )
    parser.add_argument(
        "--beam-phases", default="",
        help="comma-separated phased attend widths for the beam bench "
             "(fractions of max length or absolute columns)",
    )
    parser.add_argument(
        "--tiny", action="store_true",
        help="shrunk model/batch smoke run (CPU dress rehearsal of the "
             "full three-stage capture; numbers are not meaningful)",
    )
    parser.add_argument(
        "--backend-timeout", type=float, default=420.0,
        help="seconds to wait for JAX backend init before emitting "
             "structured tpu_unavailable records",
    )
    parser.add_argument(
        "--deadline", type=float, default=6900.0,
        help="global wall-clock budget; unfinished stages emit "
             "deadline_exceeded records and the process exits 0",
    )
    args_cli = parser.parse_args()
    if args_cli.stage is None:
        stages = STAGES[:1] if args_cli.greedy_only else STAGES
        run_stages_isolated(args_cli, stages)
        return
    stages = [
        {"greedy": STAGES[0], "beam": STAGES[1], "train": STAGES[2]}[
            args_cli.stage
        ]
    ]

    def reaper():
        time.sleep(args_cli.deadline)
        for metric in stages:
            emit_error(metric, f"deadline_exceeded_{args_cli.deadline:.0f}s")
        os._exit(0)

    threading.Thread(target=reaper, daemon=True).start()

    devices = init_backend(args_cli.backend_timeout, stages)
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    dev = devices[0]
    on_tpu = dev.platform != "cpu"
    peak_tf = peak_for(dev)

    # 4-second utterances at 25 fps; throughput saturates at batch 128
    # (honest-fetch RTF: 1136x @32, 1529x @64, 2958x @128, 3016x @256)
    batch, frames = (2, 16) if args_cli.tiny else (128, 100)
    samples = frames * 640

    if args_cli.stage == "greedy":
        rng = np.random.RandomState(0)
        audio = jnp.asarray(rng.randn(batch, samples).astype(np.float32) * 0.1)
        alens = jnp.full((batch,), samples, np.int32)
        video = jnp.asarray(rng.randn(batch, frames, 88, 88).astype(np.float32))
        vlens = jnp.full((batch,), frames, np.int32)
        try:
            model = _build_flagship(tiny=args_cli.tiny, use_flash=on_tpu)
            # init on a 2-row batch (params are batch-independent; avoids
            # compiling a second full-size graph just for initialization)
            variables = model.init(
                {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)},
                audio[:2], alens[:2], video[:2], vlens[:2],
                jnp.ones((2, 8), jnp.int32), jnp.full((2,), 8, np.int32),
            )
            if on_tpu:  # bf16 weights/activations: free TPU win (SURVEY §2.4)
                variables = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x,
                    variables,
                )
                audio = audio.astype(jnp.bfloat16)
                video = video.astype(jnp.bfloat16)
            pack = (variables, model, on_tpu, peak_tf, audio, alens, video,
                    vlens, samples)
            bench_greedy(pack, STAGES[0])
        except Exception as e:  # noqa: BLE001 — structured per-stage failure
            emit_error(STAGES[0], f"{type(e).__name__}: {e}")
    elif args_cli.stage == "beam":
        try:
            bench_beam(args_cli, on_tpu, peak_tf, samples, STAGES[1])
        except Exception as e:  # noqa: BLE001
            emit_error(STAGES[1], f"{type(e).__name__}: {e}")
    elif args_cli.stage == "train":
        try:
            bench_train(on_tpu, peak_tf, STAGES[2], tiny=args_cli.tiny,
                        train_batch=args_cli.train_batch)
        except Exception as e:  # noqa: BLE001
            emit_error(STAGES[2], f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
