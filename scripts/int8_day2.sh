#!/bin/bash
# Second int8 measurement pass: the per-source-beam streaming int8 kernel
# measured 26% SLOWER than the exact bf16 attend (measurements/r4/int8day/),
# so ops/group_attend._group_attend_q_kernel was rewritten to keep the bf16
# kernel's single fused matmul with XLA-pre-flattened per-phase scale rows.
# This pass re-validates compiled numerics for the new kernel, re-runs the
# full-graph int8 sweep at the two best batches, retunes, dress-rehearses
# bench if the tuning changed, and finally runs the flagship overfit
# demonstration (VERDICT r3 item 5) once the TPU frees up.
#
# Run detached:  nohup scripts/int8_day2.sh <followup_pid> > /tmp/int8day2_driver.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/int8day2
ARTIFACTS=${ARTIFACTS:-/root/repo/measurements/r4/int8day2}
mkdir -p "$LOG" "$ARTIFACTS"
: > "$LOG/status"

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/status"; cp "$LOG/status" "$ARTIFACTS/status" 2>/dev/null || true; }

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  note "waiting for int8_followup (pid $WAIT_PID) to finish..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
note "TPU free; starting pass 2"

run_stage() { # name timeout cmd...
  local name=$1 tmo=$2 rc; shift 2
  for attempt in 1 2; do
    note "stage $name attempt $attempt: $*"
    timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
    rc=$?
    mkdir -p "$ARTIFACTS" && cp "$LOG/$name.log" "$ARTIFACTS/" 2>/dev/null || true
    if [ "$rc" -eq 0 ]; then
      note "stage $name OK"
      return 0
    fi
    note "stage $name FAILED rc=$rc (attempt $attempt), tail:"
    tail -3 "$LOG/$name.log" | tee -a "$LOG/status"
    sleep 60
  done
  return 1
}

# Compiled numerics for the REWRITTEN attend-q kernel: the pass's int8
# points only count if this passes on device.
SKIP_INT8=0
if ! run_stage probe 1800 python scripts/probe_kernels_tpu.py \
    || ! grep -q "KERNEL PROBE OK" "$LOG/probe.log"; then
  note "PROBE FAILED — rewritten int8 attend unverified; skipping int8 points"
  SKIP_INT8=1
fi

if [ "$SKIP_INT8" != "1" ]; then
  run_stage kbisect2 2400 python scripts/bench_group_attend_q.py --batch 96
  run_stage i2 7200 python scripts/sweep_beam_cost.py \
    --batches 96,128 --variants att+ctc+lm --fused 1 \
    --phase-widths 0.25,0.5,1.0 --cache-dtype int8
fi

# Retune across ALL of today's passes. Same policy: a lossy point (any int8
# knob) must beat the best exact point by >3% to take the operating point.
# Pass-1 int8 points came from the retired per-j kernel — exclude them; the
# pass-2 logs are the quantized cache's measurement of record.
OLD_TUNING=$(cat /root/repo/bench_tuning.json 2>/dev/null)
python - <<'EOF'
import glob, json
best_exact, best_lossy = None, None
paths = (glob.glob("/tmp/int8day2/i2.log")
         + glob.glob("/tmp/int8fu/imem*.log")
         + glob.glob("/root/repo/measurements/r4/fusedday/*.log"))
for path in paths:
    if any(path.endswith(s) for s in
           ("probe.log", "driver.log", "bench.log", "status")):
        continue
    try:
        for line in open(path):
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if not d.get("rtf"):
                continue
            lossy = (d.get("cache_dtype") == "int8"
                     or d.get("mem_dtype") == "int8"
                     or d.get("quantize"))
            if lossy:
                if best_lossy is None or d["rtf"] > best_lossy["rtf"]:
                    best_lossy = d
            elif best_exact is None or d["rtf"] > best_exact["rtf"]:
                best_exact = d
    except Exception:
        pass
best = best_exact
if best_lossy is not None and (
        best is None or best_lossy["rtf"] > 1.03 * best["rtf"]):
    best = best_lossy
if best is not None:
    tuning = {
        "beam_batch": best["batch"],
        "fused_group_attend": best.get("fused", "auto") in ("auto", "1"),
        "cache_protocol": best.get("protocol", "anc"),
        "unroll": best.get("unroll", 2),
        "source": f"scripts/int8_day2.sh retune rtf={best['rtf']}"
                  f" (best exact {None if best_exact is None else best_exact['rtf']},"
                  f" best lossy {None if best_lossy is None else best_lossy['rtf']})",
    }
    if best.get("phases"):
        tuning["phase_widths"] = [float(x) for x in best["phases"].split(",")]
    for key in ("cache_dtype", "mem_dtype"):
        if best.get(key):
            tuning[key] = best[key]
    if best.get("quantize"):
        if "lm" in best["quantize"]:
            tuning["quantize_lm"] = True
        if "asr" in best["quantize"]:
            tuning["quantize_asr_model"] = True
    try:
        with open("/root/repo/bench_tuning.json") as f:
            old = json.load(f)
        for key in ("train_batch", "train_remat", "train_note"):
            if key in old:
                tuning[key] = old[key]
    except Exception:
        pass
    with open("/root/repo/bench_tuning.json", "w") as f:
        json.dump(tuning, f)
    print("retuned:", json.dumps(tuning))
EOF
note "retuned bench_tuning.json: $(cat /root/repo/bench_tuning.json 2>/dev/null)"

# Only re-dress-rehearse bench if this pass actually moved the tuning (the
# follow-up already rehearsed the previous operating point).
if [ "$(cat /root/repo/bench_tuning.json 2>/dev/null)" != "$OLD_TUNING" ]; then
  run_stage bench 7500 python bench.py
fi

note "starting flagship overfit demonstration"
bash scripts/overfit_flagship.sh > "$LOG/overfit_driver.log" 2>&1
cp "$LOG/overfit_driver.log" "$ARTIFACTS/" 2>/dev/null || true
note "ALL DONE"
