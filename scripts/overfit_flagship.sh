#!/usr/bin/env bash
# Flagship overfit demonstration on TPU (VERDICT r3 item 5): train the REAL
# 59M-param tailored-AVSR flagship config through avsr_main.py on the
# synthetic corpus until val CER ~ 0, then beam-decode the same set. Proves
# the full stack — data plane, bf16 train step, per-epoch greedy-CER
# validation, top-K averaging, checkpointing, joint beam decode, tasas WER —
# end-to-end on hardware. Artifacts (val_stats.csv, .inf/.wer, log) land in
# measurements/r4/overfit/ AS they are produced; checkpoints stay in the
# scratch dir (59 MB x epochs does not belong in git).
set -u
cd "$(dirname "$0")/.."
SCRATCH=${SCRATCH:-/tmp/overfit_flagship}
ART=measurements/r4/overfit
EPOCHS=${EPOCHS:-100}
TRAIN_TIMEOUT=${TRAIN_TIMEOUT:-6000}
mkdir -p "$ART" "$SCRATCH"

python - <<'EOF'
import sys
sys.path.insert(0, ".")
from tests.synthetic import make_synthetic_corpus
import os
root = os.environ.get("SCRATCH", "/tmp/overfit_flagship")
csv, tokens = make_synthetic_corpus(os.path.join(root, "corpus"), n=16, seed=1,
                                    nframes=16)
print("corpus:", csv)
EOF

timeout "$TRAIN_TIMEOUT" python avsr_main.py \
  --config-file configs/AVSR/tailored_transformer+ctc_spanish_tpu.yaml \
  --training-dataset "$SCRATCH/corpus/split.csv" \
  --validation-dataset "$SCRATCH/corpus/split.csv" \
  --test-dataset "$SCRATCH/corpus/split.csv" \
  --mode both \
  --output-dir "$SCRATCH/exp" \
  --output-name overfit \
  --yaml-overrides \
    training_settings:epochs:"$EPOCHS" \
    training_settings:average_epochs:3 \
    training_settings:warmup_steps:80 \
    training_settings:noam_factor:1.0 \
    training_settings:batch_size:4 \
    training_settings:accum_grad:1 \
    inference_conf:batch_size:16 \
  2>&1 | tee "$ART/train.log" | tail -40

cp "$SCRATCH/exp/val_stats.csv" "$ART/" 2>/dev/null
cp "$SCRATCH/exp/inference/overfit.inf" "$SCRATCH/exp/inference/overfit.wer" "$ART/" 2>/dev/null
echo "--- final WER ---"
cat "$ART/overfit.wer" 2>/dev/null
