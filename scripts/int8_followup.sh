#!/bin/bash
# Follow-up to scripts/int8_day.sh. The int8 KV cache measured SLOWER than
# the exact bf16 cache in the full graph (205.9x/207.0x vs 279x/283.6x —
# measurements/r4/int8day/i96.log, i128_192.log), so this pass (a) bisects
# the kernel with an isolated bf16-vs-int8 group-attend A/B, and (b) A/Bs
# the remaining XLA-side byte levers on the EXACT cache: int8 cross-attn
# memory (mem_dtype) and weight-only int8 LM (quantize_lm). Then retunes
# bench_tuning.json across all of today's logs and dress-rehearses bench.
#
# Run detached after int8_day:  nohup scripts/int8_followup.sh <int8day_pid> &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/int8fu
ARTIFACTS=${ARTIFACTS:-/root/repo/measurements/r4/int8day}
mkdir -p "$LOG" "$ARTIFACTS"
: > "$LOG/status"

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/status"; cp "$LOG/status" "$ARTIFACTS/fu_status" 2>/dev/null || true; }

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  note "waiting for int8_day (pid $WAIT_PID) to finish..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
note "int8_day done; starting follow-up A/Bs"

run_stage() { # name timeout cmd...
  local name=$1 tmo=$2 rc; shift 2
  for attempt in 1 2; do
    note "stage $name attempt $attempt: $*"
    timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
    rc=$?
    mkdir -p "$ARTIFACTS" && cp "$LOG/$name.log" "$ARTIFACTS/fu_$name.log" 2>/dev/null || true
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

# Kernel-level bisect of the int8 slowdown: isolated bf16 vs int8 attend at
# the flagship LM decode shape, full + phased widths.
run_stage kbisect 2400 python scripts/bench_group_attend_q.py --batch 96

# XLA-side byte levers on the exact cache at the two best exact batches.
run_stage imem 7200 python scripts/sweep_beam_cost.py \
  --batches 96,128 --variants att+ctc+lm --fused 1 \
  --phase-widths 0.25,0.5,1.0 --mem-dtype int8
run_stage imemw 3600 python scripts/sweep_beam_cost.py \
  --batches 128 --variants att+ctc+lm --fused 1 \
  --phase-widths 0.25,0.5,1.0 --mem-dtype int8 --quantize lm

# Retune across the whole day. Policy: a lossy point (any int8 knob) must
# beat the best exact point by >3% to take the tuning.
python - <<'EOF'
import glob, json
best_exact, best_lossy = None, None
for path in glob.glob("/tmp/int8day/*.log") + glob.glob("/tmp/int8fu/*.log") \
        + glob.glob("/root/repo/measurements/r4/fusedday/*.log"):
    if any(path.endswith(s) for s in
           ("probe.log", "driver.log", "bench.log", "tsweep.log", "status",
           "kbisect.log")):
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
        "source": f"scripts/int8_followup.sh retune rtf={best['rtf']}"
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
    # keep the train winner folded in by int8_day
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

run_stage bench 7500 python bench.py
note "ALL DONE"
