#!/bin/bash
# Chained after evidence_day.sh: re-establish the train-step cost sweep
# (VERDICT r3 item 3) whose fold-in was lost with /tmp, pick the winner
# (max RTF, remat A/B'd), fold train_batch/train_remat into
# bench_tuning.json, and dress-rehearse the driver-format bench.py.
#
# Run detached:  nohup scripts/train_day.sh <evday_pid> > /tmp/trainday_driver.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/trainday
ARTIFACTS=/root/repo/measurements/r4/evidence
mkdir -p "$LOG" "$ARTIFACTS"
: > "$LOG/status"

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/status"; cp "$LOG/status" "$ARTIFACTS/trainday_status" 2>/dev/null || true; }

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  note "waiting for evidence_day (pid $WAIT_PID)..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
note "TPU free; starting train sweep"

run_stage() { # name timeout cmd...
  local name=$1 tmo=$2 rc; shift 2
  note "stage $name: timeout $tmo $*"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  cp "$LOG/$name.log" "$ARTIFACTS/" 2>/dev/null || true
  if [ "$rc" -eq 0 ]; then note "stage $name OK"; return 0; fi
  note "stage $name FAILED rc=$rc, tail:"
  tail -3 "$LOG/$name.log" | tee -a "$LOG/status"
  return 1
}

run_stage tsweep 2700 python scripts/sweep_train_cost.py \
  --batches 16,32,64 --remat 0,1 --iters 5

python - <<'EOF'
import json
best = None
try:
    for line in open("/tmp/trainday/tsweep.log"):
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if d.get("error") or not d.get("rtf"):
            continue
        if best is None or d["rtf"] > best["rtf"]:
            best = d
except Exception:
    pass
if best is not None:
    with open("/root/repo/bench_tuning.json") as f:
        tuning = json.load(f)
    tuning["train_batch"] = best["batch"]
    tuning["train_remat"] = bool(best["remat"])
    tuning["train_note"] = (
        f"measurements/r4/evidence/tsweep.log: rtf={best['rtf']}"
        f" mfu={best.get('mfu')} epoch_hours_818h={best.get('epoch_hours_818h')}")
    with open("/root/repo/bench_tuning.json", "w") as f:
        json.dump(tuning, f)
    print("folded train winner:", json.dumps(tuning))
else:
    print("no valid train sweep point; tuning unchanged")
EOF
note "tuning now: $(cat /root/repo/bench_tuning.json 2>/dev/null)"

run_stage bench 5400 python bench.py
note "ALL DONE"
