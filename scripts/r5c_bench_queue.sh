#!/bin/bash
# Round-5c queue: post-precision-pin re-bench of the fused eval rows
# (RESULTS "Eval rendering throughput" header note) + bench.py regression.
# Tunnel-outage hardened: probes first, marks per stage, ONE JAX process
# at a time (CLAUDE.md). Comparable pre-pin rows: IPE fused 2.41 s/frame,
# 360 fused 2.04 / +ERT+cull 1.21, kplanes refine-all 2.07 (same ckpts).
cd "$(dirname "$0")/.."
LOG=/tmp/r5c_queue.log
MARK=/tmp/r5c_marks; mkdir -p "$MARK"
probe() {
  timeout 90 python -c "import jax; print(float(jax.numpy.ones(4).sum()))" \
    >/dev/null 2>&1
}
stage() { # name cmd...
  local name=$1; shift
  if [ -e "$MARK/$name.done" ]; then echo "R5C_${name}_SKIP"; return; fi
  if "$@" > "/tmp/r5c_$name.log" 2>&1; then
    touch "$MARK/$name.done"; echo "R5C_${name}_DONE"
  else
    tail -8 "/tmp/r5c_$name.log"; echo "R5C_${name}_FAILED"
  fi
}
echo "[r5c] start $(date)" >> "$LOG"
while true; do
  if probe; then
    echo "[r5c] tunnel UP $(date)" >> "$LOG"
    {
      stage benchpins python -u scripts/bench_eval.py --data_root /tmp/tex \
        --skip_hier --kp_dir /tmp/r4_kpdir --dir360 /tmp/r4_360win \
        --data360 /tmp/u360 --ipe_dir /tmp/r5_ipe
      stage benchreg python -u bench.py
    } >> "$LOG" 2>&1
    if [ -e "$MARK/benchpins.done" ] && [ -e "$MARK/benchreg.done" ]; then
      echo "[r5c] complete $(date)" >> "$LOG"; break
    fi
    echo "[r5c] incomplete; retry in 10 min" >> "$LOG"
  else
    echo "[r5c] tunnel down $(date)" >> "$LOG"
  fi
  sleep 600
done
echo R5C_QUEUE_EXIT
