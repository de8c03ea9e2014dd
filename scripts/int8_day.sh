#!/bin/bash
# Round-4 session-2 measurement pass: (a) A/B the int8 beam KV cache
# (ops/kv_quant.py, cache_dtype: int8) on device at the fused+phases
# operating point — the roofline in docs/DESIGN.md says the beam step cost
# IS the cache bytes, so halving them is the one remaining throughput lever;
# (b) the flagship train-step cost sweep (VERDICT r3 item 3); (c) retune
# bench_tuning.json to the best measured beam point and dress-rehearse the
# driver's round-end `python bench.py`.
#
# Run detached:  nohup scripts/int8_day.sh > /tmp/int8day/driver.log 2>&1 &
# Poll:          cat /tmp/int8day/status; tail /tmp/int8day/*.log
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/int8day
ARTIFACTS=${ARTIFACTS:-/root/repo/measurements/r4/int8day}
mkdir -p "$LOG" "$ARTIFACTS"
: > "$LOG/status"

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/status"; cp "$LOG/status" "$ARTIFACTS/status" 2>/dev/null || true; }

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

# The compiled numerics probe now covers group_attend_anc_q + the int8
# cache-column write; the int8 points below only count if it PASSES on
# device. A pre-existing passing probe.log (run manually before this
# driver) is honored to save the ~15 min recompile.
if ! grep -q "KERNEL PROBE OK" "$ARTIFACTS/probe.log" 2>/dev/null; then
  if ! run_stage probe 1800 python scripts/probe_kernels_tpu.py \
      || ! grep -q "KERNEL PROBE OK" "$LOG/probe.log"; then
    note "PROBE FAILED — int8 attend unverified; skipping int8 beam points"
    SKIP_INT8=1
  fi
else
  cp "$ARTIFACTS/probe.log" "$LOG/probe.log"
  note "probe already PASSED earlier today (artifacts/probe.log); reusing"
fi
SKIP_INT8=${SKIP_INT8:-0}

if [ "$SKIP_INT8" != "1" ]; then
  # Current operating point (bench_tuning.json): fused + phases + anc + u2,
  # batch 96 = 279x RT (283.6x @128). int8 halves the attend traffic and the
  # cache footprint, so also probe one batch up.
  run_stage i96 3600 python scripts/sweep_beam_cost.py \
    --batches 96 --variants att+ctc+lm --fused 1 \
    --phase-widths 0.25,0.5,1.0 --cache-dtype int8
  run_stage i128_192 7200 python scripts/sweep_beam_cost.py \
    --batches 128,192 --variants att+ctc+lm --fused 1 \
    --phase-widths 0.25,0.5,1.0 --cache-dtype int8
fi

# Train-step cost sweep (VERDICT r3 item 3): batch 16/32/64 x remat off/on.
run_stage tsweep 10800 python scripts/sweep_train_cost.py \
  --batches 16,32,64 --remat 0,1

# Retune the beam operating point across this pass + the fused-day logs.
# Policy: the int8 cache is not bit-exact (docs/DESIGN.md), so it only takes
# the operating point if it beats the best exact point by >3% — hypothesis
# identity with the exact path is CI-pinned (tests/test_fused_beam_ci.py)
# but the margin keeps a near-tie on the exact path.
python - <<'EOF'
import glob, json
best_exact, best_i8 = None, None
for path in glob.glob("/tmp/int8day/*.log") \
        + glob.glob("/root/repo/measurements/r4/fusedday/*.log"):
    if any(path.endswith(s) for s in
           ("probe.log", "driver.log", "bench.log", "tsweep.log", "status")):
        continue
    try:
        for line in open(path):
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if not d.get("rtf"):
                continue
            if d.get("cache_dtype") == "int8":
                if best_i8 is None or d["rtf"] > best_i8["rtf"]:
                    best_i8 = d
            elif best_exact is None or d["rtf"] > best_exact["rtf"]:
                best_exact = d
    except Exception:
        pass
best = best_exact
if best_i8 is not None and (
        best is None or best_i8["rtf"] > 1.03 * best["rtf"]):
    best = best_i8
if best is not None:
    tuning = {
        "beam_batch": best["batch"],
        "fused_group_attend": best.get("fused", "auto") in ("auto", "1"),
        "cache_protocol": best.get("protocol", "anc"),
        "unroll": best.get("unroll", 2),
        "source": f"scripts/int8_day.sh retune rtf={best['rtf']}"
                  f" (best exact {None if best_exact is None else best_exact['rtf']},"
                  f" best int8 {None if best_i8 is None else best_i8['rtf']})",
    }
    if best.get("phases"):
        tuning["phase_widths"] = [float(x) for x in best["phases"].split(",")]
    if best.get("cache_dtype"):
        tuning["cache_dtype"] = best["cache_dtype"]
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

# Fold the train sweep's winner into the tuning so bench.py's train stage
# lands on it (bench_train reads train_batch from bench_tuning.json).
python - <<'EOF'
import json
best = None
try:
    for line in open("/tmp/int8day/tsweep.log"):
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if d.get("rtf") and (best is None or d["rtf"] > best["rtf"]):
                best = d
except Exception:
    pass
if best is not None:
    with open("/root/repo/bench_tuning.json") as f:
        tuning = json.load(f)
    tuning["train_batch"] = best["batch"]
    tuning["train_remat"] = bool(best.get("remat"))
    tuning["train_note"] = (
        f"sweep_train_cost winner rtf={best['rtf']} remat={best['remat']}"
    )
    with open("/root/repo/bench_tuning.json", "w") as f:
        json.dump(tuning, f)
    print("train winner:", json.dumps(best))
EOF
note "tuning after train fold: $(cat /root/repo/bench_tuning.json 2>/dev/null)"

# Dress-rehearse exactly what the driver runs at round end.
run_stage bench 7500 python bench.py

cp -r "$LOG"/. "$ARTIFACTS"/ 2>/dev/null || true
note "ALL DONE"
