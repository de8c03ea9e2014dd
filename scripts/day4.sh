#!/bin/bash
# Round-4 continuation: single prioritized on-device pass combining
# evidence_day.sh + train_day.sh, ordered so a wall-clock cutoff still
# leaves the top items proven. Each stage persists its log into
# measurements/r4/evidence/ the moment it completes.
#
#   1. probe   — compiled numerics of ALL fused kernels (gates int8/fused)
#   2. tsweep  — flagship train-step cost sweep (batch x remat), fold the
#                winner into bench_tuning.json (VERDICT r3 item 3)
#   3. overfit — flagship 59M-param overfit via avsr_main.py (item 5)
#   4. icombo  — combined cache_dtype+mem_dtype int8 beam point @96
#   5. tbisect — flagship train-step bisect at the tuned batch
#   6. retune beam point iff a lossy point beat exact by >3%, then bench
#
# Run detached:  nohup scripts/day4.sh > /tmp/day4_driver.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/day4
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
  cp "$LOG/status" "$ARTIFACTS/status" 2>/dev/null || true
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

# --- 2. train-step cost sweep + fold winner into tuning ---
run_stage tsweep 2700 python scripts/sweep_train_cost.py \
  --batches 16,32,64 --remat 0,1 --iters 5
python - <<'EOF'
import json
best = None
try:
    for line in open("/tmp/day4/tsweep.log"):
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
    import os
    with open("/root/repo/bench_tuning.json.tmp", "w") as f:
        json.dump(tuning, f)
    os.replace("/root/repo/bench_tuning.json.tmp", "/root/repo/bench_tuning.json")
    print("folded train winner:", json.dumps(tuning))
else:
    print("no valid train sweep point; tuning unchanged")
EOF
note "tuning after tsweep: $(cat /root/repo/bench_tuning.json 2>/dev/null)"

# --- 3. flagship overfit demonstration ---
EPOCHS=60 TRAIN_TIMEOUT=2400 run_stage overfit_driver 3000 \
  bash scripts/overfit_flagship.sh
note "overfit done; final WER file: $(tail -1 measurements/r4/overfit/overfit.wer 2>/dev/null || echo MISSING)"

# --- 4. combined int8 byte levers at the tuned beam batch ---
if [ "$PROBE_OK" = "1" ]; then
  run_stage icombo 2100 python scripts/sweep_beam_cost.py \
    --batches 96 --variants att+ctc+lm --fused 1 \
    --phase-widths 0.25,0.5,1.0 --cache-dtype int8 --mem-dtype int8
fi

# --- 5. flagship train-step bisect at the tuned batch ---
TB=$(python - <<'EOF'
import json
try:
    print(json.load(open("/root/repo/bench_tuning.json")).get("train_batch", 64))
except Exception:
    print(64)
EOF
)
run_stage tbisect 2100 python scripts/sweep_train_bisect.py --batch "$TB"

# --- 6. retune beam point iff a lossy point beat exact by >3% ---
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
# ADVICE r4 (medium): without an exact baseline there is no margin to
# compare against — never adopt a lossy point unconditionally; and any
# lossy adoption would need an accuracy gate, so lossy points only win
# over a MEASURED exact baseline by >3%.
if best_exact is not None and best_lossy is not None and (
        best_lossy["rtf"] > 1.03 * best_exact["rtf"]):
    best = best_lossy
if best is not None:
    tuning = {
        "beam_batch": best["batch"],
        "fused_group_attend": best.get("fused", "auto") in ("auto", "1"),
        "cache_protocol": best.get("protocol", "anc"),
        "unroll": best.get("unroll", 2),
        "source": f"scripts/day4.sh retune rtf={best['rtf']}"
                  f" (best exact {None if best_exact is None else best_exact['rtf']},"
                  f" best lossy {None if best_lossy is None else best_lossy['rtf']})",
    }
    if best.get("phases"):
        tuning["phase_widths"] = [float(x) for x in best["phases"].split(",")]
    for key in ("cache_dtype", "mem_dtype"):
        if best.get(key):
            tuning[key] = best[key]
    # ADVICE r4 (medium): a weight-quantized winner must carry its knobs
    # into the tuning, or bench.py would measure a different config than
    # the one that produced the recorded rtf
    q = best.get("quantize") or ""
    if "lm" in q:
        tuning["quantize_lm"] = True
    if "asr" in q:
        tuning["quantize_asr_model"] = True
    try:
        with open("/root/repo/bench_tuning.json") as f:
            old = json.load(f)
        for key in ("train_batch", "train_remat", "train_note"):
            if key in old:
                tuning[key] = old[key]
    except Exception:
        pass
    import os
    with open("/root/repo/bench_tuning.json.tmp", "w") as f:
        json.dump(tuning, f)
    os.replace("/root/repo/bench_tuning.json.tmp", "/root/repo/bench_tuning.json")
    print("retuned:", json.dumps(tuning))
EOF
note "final tuning: $(cat /root/repo/bench_tuning.json 2>/dev/null)"

if [ "$(cat /root/repo/bench_tuning.json 2>/dev/null)" != "$OLD_TUNING" ]; then
  run_stage bench 5400 python bench.py
fi
note "ALL DONE"
