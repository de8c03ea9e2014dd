#!/bin/bash
# Round-5 prioritized on-device pass (VERDICT r4 "Next round" + ADVICE r4).
# Stage order puts the round's DELIVERABLES first so a wall-clock cutoff
# still leaves them proven (the r4 lesson: the overfit died to a stage
# budget while cheap sweeps completed):
#
#   1. overfit — flagship 59M overfit to low WER via avsr_main.py, artifact
#                committed (VERDICT item 1). Skipped if the .wer exists.
#   2. parity  — trained-weights decode rehearsal: torch twin + python
#                reference beam decode of the averaged overfit checkpoint
#                must match our on-device beam .inf (item 3). CPU-only.
#   3. probe   — compiled numerics of all fused kernels (gate)
#   4. tsweep  — train-step cost sweep batch x remat @ frames 100 (item 4)
#   5. tsweep500 — the TRAINING-ENVELOPE point: frames 500 (item 7)
#   6. tbisect — named diagnostics for the non-frontend train cost
#   7. beamsweep — EXACT-only beam points (batch x phases x unroll)
#   8. retune  — fold measured winners into bench_tuning.json. Policy per
#                ADVICE r4: EXACT points only — a lossy (int8) point can
#                never become the headline tuning without an explicit
#                accuracy gate, and no-exact-baseline means no retune.
#                Writes are atomic (temp + os.replace).
#   9. bench   — full three-stage capture with the final tuning
#
# Ends by asserting every headline artifact exists; exit nonzero otherwise.
# Run detached:  nohup scripts/day5.sh > /tmp/day5_driver.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/day5
ARTIFACTS=/root/repo/measurements/r5/evidence
mkdir -p "$LOG" "$ARTIFACTS" measurements/r5/overfit
: > "$LOG/status"

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/status"; cp "$LOG/status" "$ARTIFACTS/status" 2>/dev/null || true; }

run_stage() { # name timeout cmd...
  local name=$1 tmo=$2 rc; shift 2
  note "stage $name: timeout $tmo $*"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  cp "$LOG/$name.log" "$ARTIFACTS/" 2>/dev/null || true
  if [ "$rc" -eq 0 ]; then
    note "stage $name OK"
    return 0
  fi
  note "stage $name FAILED rc=$rc, tail:"
  tail -3 "$LOG/$name.log" | tee -a "$LOG/status"
  cp "$LOG/status" "$ARTIFACTS/status" 2>/dev/null || true
  return 1
}

# --- 1. flagship overfit (the round's deliverable; biggest budget, first) ---
if [ -f measurements/r5/overfit/overfit.wer ]; then
  note "overfit artifact already present; skipping train"
else
  run_stage overfit 7200 bash scripts/overfit_flagship.sh
fi
note "overfit WER: $(cat measurements/r5/overfit/overfit.wer 2>/dev/null | tr '\n' ' ' || echo MISSING)"

# --- 2. trained-weights parity rehearsal (CPU; needs the overfit ckpt) ---
run_stage parity 5400 python scripts/parity_rehearsal.py \
  --art measurements/r5/parity --merge concat

# --- 3. compiled-kernel numerics probe (gate for fused beam points) ---
PROBE_OK=0
if run_stage probe 2700 python scripts/probe_kernels_tpu.py \
    && grep -q "KERNEL PROBE OK" "$LOG/probe.log"; then
  PROBE_OK=1
else
  note "PROBE not OK - fused beam points will be skipped"
fi

# --- 4./5. train-step cost sweep: bench point + training envelope ---
run_stage tsweep 5400 python scripts/sweep_train_cost.py \
  --batches 16,32,64 --remat 0,1 --iters 5
run_stage tsweep500 3600 python scripts/sweep_train_cost.py \
  --batches 2,4,8 --frames 500 --remat 0,1 --iters 3

# --- 6. named train diagnostics at the measured-best batch ---
TB=$(python - <<'EOF'
import json
best = None
try:
    for line in open("/tmp/day5/tsweep.log"):
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if d.get("rtf") and (best is None or d["rtf"] > best["rtf"]):
                best = d
except Exception:
    pass
print(best["batch"] if best else 16)
EOF
)
run_stage tbisect 3600 python scripts/sweep_train_bisect.py \
  --batch "$TB" --diagnostics

# --- 7. exact beam points around the tuned operating point ---
if [ "$PROBE_OK" = "1" ]; then
  run_stage beamsweep 5400 python scripts/sweep_beam_cost.py \
    --batches 128,160 --variants att+ctc+lm --fused 1 \
    --phase-widths 0.25,0.5,1.0
  run_stage beamphases 3600 python scripts/sweep_beam_cost.py \
    --batches 128 --variants att+ctc+lm --fused 1 \
    --phase-widths 0.125,0.25,0.5,1.0
fi

# --- 8. retune: EXACT winners only, atomic write ---
python - <<'EOF'
import glob, json, os

TUNING = "/root/repo/bench_tuning.json"
try:
    tuning = json.load(open(TUNING))
except Exception:
    tuning = {}

def best_point(paths, key="rtf", want=None):
    best = None
    for path in paths:
        try:
            for line in open(path):
                line = line.strip()
                if not line.startswith("{"):
                    continue
                d = json.loads(line)
                if not d.get(key) or d.get("error"):
                    continue
                # ADVICE r4: lossy points (int8 caches / weight quant) are
                # excluded from the headline pool entirely
                if (d.get("cache_dtype") == "int8" or d.get("mem_dtype") == "int8"
                        or d.get("quantize")):
                    continue
                if want and not all(d.get(k) == v for k, v in want.items()):
                    continue
                if best is None or d[key] > best[key]:
                    best = d
        except Exception:
            pass
    return best

# train point (frames 100): compare against the recorded r4 operating point
tb = best_point(["/tmp/day5/tsweep.log"])
if tb is not None:
    tuning["train_batch"] = tb["batch"]
    tuning["train_remat"] = bool(tb["remat"])
    tuning["train_note"] = (
        f"measurements/r5/evidence/tsweep.log: rtf={tb['rtf']}"
        f" mfu={tb.get('mfu_pct')} epoch_hours_818h={tb.get('epoch_hours_818h')}")

# training-envelope point (frames 500)
t5 = best_point(["/tmp/day5/tsweep500.log"])
if t5 is not None:
    tuning["train_frames500_batch"] = t5["batch"]
    tuning["train_frames500_remat"] = bool(t5["remat"])

# beam point: only EXACT candidates measured THIS pass compete, and only a
# >3% win over the recorded r4 exact point (279.0 @96) moves the tuning
beam = best_point(["/tmp/day5/beamsweep.log", "/tmp/day5/beamphases.log"])
prev_rtf = 279.0
if beam is not None and beam["rtf"] > 1.03 * prev_rtf:
    tuning["beam_batch"] = beam["batch"]
    tuning["fused_group_attend"] = beam.get("fused", "auto") in ("auto", "1", True)
    tuning["cache_protocol"] = beam.get("protocol", "anc")
    tuning["unroll"] = beam.get("unroll", 2)
    if beam.get("phases"):
        tuning["phase_widths"] = [float(x) for x in str(beam["phases"]).split(",")]
    tuning["source"] = (
        f"scripts/day5.sh retune rtf={beam['rtf']} @ batch {beam['batch']}"
        f" (exact-only pool; r4 exact baseline {prev_rtf})")
elif beam is not None:
    print(f"beam point {beam['rtf']} does not beat {prev_rtf} by >3%; keeping tuning")

tmp = TUNING + ".tmp"
with open(tmp, "w") as f:
    json.dump(tuning, f)
os.replace(tmp, TUNING)
print("tuning:", json.dumps(tuning))
EOF
note "final tuning: $(cat /root/repo/bench_tuning.json 2>/dev/null)"

# --- 9. final capture ---
run_stage bench 7200 python bench.py

# --- artifact assertions: the round's evidence must exist ---
MISSING=""
for f in measurements/r5/overfit/overfit.wer \
         measurements/r5/overfit/train.log \
         measurements/r5/parity/parity.json \
         "$ARTIFACTS/tsweep.log" "$ARTIFACTS/bench.log"; do
  [ -s "$f" ] || MISSING="$MISSING $f"
done
if [ -n "$MISSING" ]; then
  note "DAY5 INCOMPLETE - missing:$MISSING"
  exit 1
fi
note "ALL DONE (all headline artifacts present)"
