#!/bin/bash
# Round-5 TPU queue watcher: probe the axon tunnel; when it is up, drain
# the remaining r4b measurement stages (marks-based resume) plus round-5
# additions. ONE JAX process at a time (CLAUDE.md); the probe is bounded
# and killed by timeout so it cannot linger holding the TPU client.
cd "$(dirname "$0")/.."
LOG=/tmp/r5_queue.log
probe() {
  timeout 90 python -c "import jax; print(float(jax.numpy.ones(4).sum()))" \
    >/dev/null 2>&1
}
echo "[r5_queue] start $(date)" >> "$LOG"
while true; do
  if probe; then
    echo "[r5_queue] tunnel UP $(date) — draining queue" >> "$LOG"
    bash scripts/r4b_measurements.sh >> "$LOG" 2>&1
    if grep -q R4B_ALL_DONE "$LOG" && \
       ! tail -40 "$LOG" | grep -q R4B_.*_FAILED; then
      echo "[r5_queue] queue complete $(date)" >> "$LOG"
      break
    fi
    echo "[r5_queue] queue incomplete (failures above); retry in 10 min" >> "$LOG"
  else
    echo "[r5_queue] tunnel still down $(date)" >> "$LOG"
  fi
  sleep 600
done
echo R5_QUEUE_EXIT
