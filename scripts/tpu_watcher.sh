#!/bin/bash
# Tunnel watcher: probe the TPU backend every 15 min; the moment it comes
# up, run the round-5 evidence agenda (scripts/tpu_round5_agenda.sh) once.
# Bounded at ~11 h of watching so it can't outlive the round.
#
#   nohup bash scripts/tpu_watcher.sh &   (or run_in_background)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/TPU_R5_AGENDA.log
DEADLINE=$(( $(date +%s) + 11 * 3600 ))

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if timeout 120 python -c "import jax; print(jax.devices())" \
        >> "$LOG" 2>&1; then
        echo "[watcher $(date -u +%H:%M:%S)] tunnel UP - running agenda" \
            | tee -a "$LOG"
        bash scripts/tpu_round5_agenda.sh
        echo "[watcher $(date -u +%H:%M:%S)] agenda finished rc=$?" \
            | tee -a "$LOG"
        exit 0
    fi
    echo "[watcher $(date -u +%H:%M:%S)] tunnel down; sleeping 900s" >> "$LOG"
    sleep 900
done
echo "[watcher] deadline reached with tunnel down" | tee -a "$LOG"
exit 1
