#!/bin/bash
# Follow-up measurement pass once scripts/tpu_day.sh has finished: the first
# tpu_day of round 3 ran entirely on the XLA group-attend fallback because the
# fused kernel tripped a Mosaic i1-concat bug at first real compile (fixed in
# ops/group_attend.py). This script re-gates the FIXED kernels on device and,
# if they pass, measures the fused ancestry protocol and folds the overall
# best operating point back into bench_tuning.json for the driver's bench.
#
# Run detached:  nohup scripts/fused_day.sh <tpuday_pid> > /tmp/fusedday/driver.log 2>&1 &
# Poll:          cat /tmp/fusedday/status; tail /tmp/fusedday/*.log
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/fusedday
ARTIFACTS=${ARTIFACTS:-/root/repo/measurements/r4/fusedday}
mkdir -p "$LOG" "$ARTIFACTS"
: > "$LOG/status"

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/status"; cp "$LOG/status" "$ARTIFACTS/status" 2>/dev/null || true; }

TPUDAY_PID=${1:-0}
if [ "$TPUDAY_PID" != "0" ]; then
  note "waiting for tpu_day (pid $TPUDAY_PID) to finish..."
  while kill -0 "$TPUDAY_PID" 2>/dev/null; do sleep 60; done
fi
note "tpu_day done; starting fused measurement pass"

run_stage() { # name timeout cmd...
  local name=$1 tmo=$2 rc; shift 2
  for attempt in 1 2; do
    note "stage $name attempt $attempt: $*"
    timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
    rc=$?
    # Persist evidence into the repo AS the stage completes — /tmp dies with
    # the VM, and a trailing cp dies with the tunnel.
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

if ! run_stage probe 1800 python scripts/probe_kernels_tpu.py \
    || ! grep -q "KERNEL PROBE OK" "$LOG/probe.log"; then
  note "PROBE STILL FAILING — keeping the XLA operating point; nothing to do"
  exit 0
fi
note "fixed kernels pass compiled numerics on device"

# Fused sweep. 128 OOMed under XLA (logits materialization); the fused kernel
# keeps logits in VMEM, so retry it alongside an intermediate 96.
run_stage fsweep 10800 python scripts/sweep_beam_cost.py \
  --batches 32,64,96,128 --variants att+ctc+lm --fused 1

WINNER=$(python - <<'EOF'
import json
best, bb = -1.0, 64
try:
    for line in open("/tmp/fusedday/fsweep.log"):
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if d.get("rtf", -1) > best:
            best, bb = d["rtf"], d["batch"]
except Exception:
    pass
print(bb)
EOF
)
note "fused sweep winner batch=$WINNER"

# A/B the protocol knobs under the fused kernel at its winner batch.
run_stage fab_append 3600 python scripts/sweep_beam_cost.py \
  --batches "$WINNER" --variants att+ctc+lm --fused 1 --protocol append
run_stage fab_phases 3600 python scripts/sweep_beam_cost.py \
  --batches "$WINNER" --variants att+ctc+lm --fused 1 --phase-widths 0.25,0.5,1.0
run_stage fab_quant 3600 python scripts/sweep_beam_cost.py \
  --batches "$WINNER" --variants att+ctc+lm --fused 1 --quantize lm
run_stage fab_unroll 3600 python scripts/sweep_beam_cost.py \
  --batches "$WINNER" --variants att+ctc+lm --fused 1 --unroll 1

# Retune across BOTH days' logs: the driver's round-end plain `python bench.py`
# reads bench_tuning.json, so the capture lands on the best measured point.
python - <<'EOF'
import glob, json
best = None
for path in glob.glob("/tmp/tpuday/*.log") + glob.glob("/tmp/fusedday/*.log"):
    if path.endswith(("probe.log", "driver.log", "bench.log", "stem.log")):
        continue
    try:
        for line in open(path):
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if d.get("rtf") and (best is None or d["rtf"] > best["rtf"]):
                best = d
    except Exception:
        pass
if best is not None:
    tuning = {
        "beam_batch": best["batch"],
        "fused_group_attend": best.get("fused", "auto") in ("auto", "1"),
        "cache_protocol": best.get("protocol", "anc"),
        "unroll": best.get("unroll", 2),
        "source": f"scripts/fused_day.sh retune rtf={best['rtf']}",
    }
    if best.get("phases"):
        tuning["phase_widths"] = [float(x) for x in best["phases"].split(",")]
    if best.get("quantize"):
        if "lm" in best["quantize"]:
            tuning["quantize_lm"] = True
        if "asr" in best["quantize"]:
            tuning["quantize_asr_model"] = True
    with open("/root/repo/bench_tuning.json", "w") as f:
        json.dump(tuning, f)
    print("retuned:", json.dumps(tuning))
EOF
note "retuned bench_tuning.json: $(cat /root/repo/bench_tuning.json 2>/dev/null)"

# Dress-rehearse exactly what the driver runs at round end.
run_stage bench 7500 python bench.py

# Per-stage copies already landed in $ARTIFACTS; this is just a final sync.
cp -r "$LOG"/. "$ARTIFACTS"/ 2>/dev/null || true
note "ALL DONE"
