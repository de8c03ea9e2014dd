#!/bin/bash
# One-shot measurement plan for the moment the TPU tunnel returns.
#
# Waits for the backend, then runs (in order, each logged + retried once):
#   1. probe_kernels_tpu.py      — compiled numerics gate for the 3 Pallas kernels
#   2. sweep_beam_cost.py        — ancestry beam RTF/MFU sweep, batches 32/64/128
#   3. bench_stem.py             — visual-stem roofline (VERDICT r2 item 7)
#   4. bench.py --beam-batch <w> — driver-format capture at the sweep's winner
#
# Run detached:  nohup scripts/tpu_day.sh > /tmp/tpuday/driver.log 2>&1 &
# Poll:          cat /tmp/tpuday/status; tail /tmp/tpuday/*.log
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/tpuday
ARTIFACTS=${ARTIFACTS:-/root/repo/measurements/r4/tpuday}
mkdir -p "$LOG" "$ARTIFACTS"
: > "$LOG/status"

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/status"; cp "$LOG/status" "$ARTIFACTS/status" 2>/dev/null || true; }

note "waiting for TPU backend..."
while true; do
  if timeout 150 python -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices(); assert d[0].platform != 'cpu'
x = jnp.ones((128,128), jnp.bfloat16)
np.asarray(x @ x)
" 2>"$LOG/wait_err.log"; then
    note "TPU BACK"
    break
  fi
  sleep 90
done

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

FUSED_OK=true
if ! run_stage probe 1800 python scripts/probe_kernels_tpu.py \
    || ! grep -q "KERNEL PROBE OK" "$LOG/probe.log"; then
  # Never time (or let the driver bench hit) an unverified compiled kernel:
  # fall back to the XLA group-attend formulation process-wide via the env
  # kill-switch (ops/attention.py) so the round still captures beam numbers.
  note "PROBE FAILED — falling back to the XLA formulation for all stages"
  export TAVSR_FUSED_GROUP_ATTEND=0
  FUSED_OK=false
fi

run_stage sweep 10800 python scripts/sweep_beam_cost.py \
  --batches 32,64,128 --variants att+ctc+lm

WINNER=$(python - <<'EOF'
import json
best, bb = -1.0, 32
try:
    for line in open("/tmp/tpuday/sweep.log"):
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
note "sweep winner batch=$WINNER"

# Persist the measured operating point where the driver's round-end plain
# `python bench.py` (and every future capture) will pick it up as the
# default — winner batch + the probe's fused-kernel verdict.
cat > /root/repo/bench_tuning.json <<EOF
{"beam_batch": $WINNER, "fused_group_attend": $FUSED_OK,
 "source": "scripts/tpu_day.sh sweep $(date -u +%Y-%m-%dT%H:%MZ)"}
EOF
note "wrote bench_tuning.json (beam_batch=$WINNER fused=$FUSED_OK)"

run_stage bench 7500 python bench.py --beam-batch "$WINNER"

run_stage stem 3600 python scripts/bench_stem.py --batch 128

# A/B evidence (optional, after the driver-critical captures):
#   fused Pallas group attend vs the XLA formulation, the ancestry protocol
#   vs the round-1 append/permute protocol, phased attend widths, and
#   weight-only int8 LM quantization — all at the winner batch
run_stage ab_xla 3600 python scripts/sweep_beam_cost.py \
  --batches "$WINNER" --variants att+ctc+lm --fused 0
run_stage ab_append 3600 python scripts/sweep_beam_cost.py \
  --batches "$WINNER" --variants att+ctc+lm --protocol append
run_stage ab_phases 3600 python scripts/sweep_beam_cost.py \
  --batches "$WINNER" --variants att+ctc+lm --phase-widths 0.25,0.5,1.0
run_stage ab_quant 3600 python scripts/sweep_beam_cost.py \
  --batches "$WINNER" --variants att+ctc+lm --quantize lm
run_stage ab_unroll 3600 python scripts/sweep_beam_cost.py \
  --batches "$WINNER" --variants att+ctc+lm --unroll 1

# Fold the overall best measured operating point (across the sweep and every
# A/B) back into bench_tuning.json — the driver's round-end plain
# `python bench.py` reads it, so the capture lands on the best point.
python - "$FUSED_OK" <<'EOF'
import json, sys
best = None
for name in ("sweep", "ab_xla", "ab_append", "ab_phases", "ab_quant",
             "ab_unroll"):
    try:
        for line in open(f"/tmp/tpuday/{name}.log"):
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if d.get("rtf") and (best is None or d["rtf"] > best["rtf"]):
                best = d
    except Exception:
        pass
if best is not None:
    fused_ok = sys.argv[1] == "true"
    tuning = {
        "beam_batch": best["batch"],
        "fused_group_attend":
            fused_ok if best.get("fused", "auto") == "auto"
            else best["fused"] == "1",
        "cache_protocol": best.get("protocol", "anc"),
        "unroll": best.get("unroll", 2),
        "source": f"scripts/tpu_day.sh retune rtf={best['rtf']}",
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
note "ALL DONE"
