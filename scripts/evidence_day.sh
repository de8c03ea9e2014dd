#!/bin/bash
# Round-4 evidence recovery pass. Earlier int8day/overfit runs produced
# numbers (cited in docs/ROADMAP.md and commit messages) whose logs lived in
# /tmp on a machine that reset — the evidence is gone. The tunnel is live
# again: re-establish every missing artifact ON DEVICE, each stage persisting
# its log into measurements/r4/ the moment it completes, ordered by value so
# a wall-clock cutoff still leaves the top items proven.
#
#   1. probe      — compiled numerics of ALL fused kernels incl. the
#                   rewritten int8 attend-q (gates every fused/int8 claim)
#   2. overfit    — flagship 59M-param overfit via avsr_main.py (VERDICT r3
#                   item 5; ROADMAP claims artifacts that are missing)
#   3. icombo     — combined cache_dtype+mem_dtype int8 beam point @96
#   4. tbisect    — flagship train-step bisect at the tuned batch
#   5. retune + bench dress rehearsal iff the tuning moved
#
# Run detached:  nohup scripts/evidence_day.sh > /tmp/evday_driver.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/evday
ARTIFACTS=/root/repo/measurements/r4/evidence
mkdir -p "$LOG" "$ARTIFACTS"
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
  return 1
}

# --- 1. compiled-kernel numerics probe (gate) ---
PROBE_OK=0
if run_stage probe 1800 python scripts/probe_kernels_tpu.py \
    && grep -q "KERNEL PROBE OK" "$LOG/probe.log"; then
  PROBE_OK=1
else
  note "PROBE not OK - int8/fused points will be skipped"
fi

# --- 2. flagship overfit demonstration ---
note "starting flagship overfit"
EPOCHS=60 TRAIN_TIMEOUT=2700 bash scripts/overfit_flagship.sh \
  > "$LOG/overfit_driver.log" 2>&1
cp "$LOG/overfit_driver.log" "$ARTIFACTS/" 2>/dev/null || true
note "overfit done; final WER file: $(tail -1 measurements/r4/overfit/overfit.wer 2>/dev/null || echo MISSING)"

# --- 3. combined int8 byte levers at the tuned beam batch ---
if [ "$PROBE_OK" = "1" ]; then
  run_stage icombo 2100 python scripts/sweep_beam_cost.py \
    --batches 96 --variants att+ctc+lm --fused 1 \
    --phase-widths 0.25,0.5,1.0 --cache-dtype int8 --mem-dtype int8
fi

# --- 4. flagship train-step bisect ---
TB=$(python - <<'EOF'
import json
try:
    print(json.load(open("/root/repo/bench_tuning.json")).get("train_batch", 64))
except Exception:
    print(64)
EOF
)
run_stage tbisect 2100 python scripts/sweep_train_bisect.py --batch "$TB"

# --- 5. retune iff a lossy point beat the exact operating point by >3% ---
OLD_TUNING=$(cat /root/repo/bench_tuning.json 2>/dev/null)
python - <<'EOF'
import glob, json
best_exact, best_lossy = None, None
paths = (glob.glob("/root/repo/measurements/r4/evidence/icombo.log")
         + glob.glob("/root/repo/measurements/r4/fusedday/*.log"))
for path in paths:
    if any(path.endswith(s) for s in ("probe.log", "bench.log", "status")):
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
                     or d.get("mem_dtype") == "int8" or d.get("quantize"))
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
        "source": f"scripts/evidence_day.sh retune rtf={best['rtf']}"
                  f" (best exact {None if best_exact is None else best_exact['rtf']},"
                  f" best lossy {None if best_lossy is None else best_lossy['rtf']})",
    }
    if best.get("phases"):
        tuning["phase_widths"] = [float(x) for x in best["phases"].split(",")]
    for key in ("cache_dtype", "mem_dtype"):
        if best.get(key):
            tuning[key] = best[key]
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
note "final tuning: $(cat /root/repo/bench_tuning.json 2>/dev/null)"

if [ "$(cat /root/repo/bench_tuning.json 2>/dev/null)" != "$OLD_TUNING" ]; then
  run_stage bench 5400 python bench.py
fi
note "ALL DONE"
