#!/bin/bash
# Chain the flagship overfit demonstration (scripts/overfit_flagship.sh,
# VERDICT r3 item 5) to start as soon as the int8 follow-up pass releases
# the TPU. Run detached: nohup scripts/overfit_chain.sh <followup_pid> &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  echo "[$(date +%H:%M:%S)] waiting for follow-up (pid $WAIT_PID)..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(date +%H:%M:%S)] TPU free; starting flagship overfit"
bash scripts/overfit_flagship.sh
echo "[$(date +%H:%M:%S)] overfit chain done"
