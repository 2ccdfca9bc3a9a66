#!/bin/bash
# Round-5d queue: verify + bench the _dotx limb-split kernel dots.
#   ab360    — scored A/B of the 360-winner ckpt through the kernel
#              (HIGHEST-pinned result was 24.902; XLA 24.902)
#   occtrain — 3k occupancy ckpt on /tmp/tex for the occ bench rows
#   benchall — EVERY eval-throughput row in one coherent run (trains the
#              vanilla ckpt into /tmp/bench_van automatically): hier
#              XLA/fused/ERT/cull + occ + kplanes + 360 + IPE
# ONE JAX process at a time; marks-based resume.
set -x
cd "$(dirname "$0")/.."
MARK=/tmp/r5d_marks; mkdir -p "$MARK"
stage() {
  local name=$1; shift
  if [ -e "$MARK/$name.done" ]; then echo "R5D_${name}_SKIP"; return; fi
  if "$@" > "/tmp/r5d_$name.log" 2>&1; then
    touch "$MARK/$name.done"; echo "R5D_${name}_DONE"
  else
    tail -8 "/tmp/r5d_$name.log"; echo "R5D_${name}_FAILED"
  fi
}

stage ab360 python -u -m nerf_sandbox_tpu.scripts.eval_nerf \
  --data_root /tmp/u360 --out_dir /tmp/r4_360win --split val \
  --eval_out /tmp/r4_360win/eval_dotx --no_images --val_exact false

stage occtrain python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_root /tmp/tex --out_dir /tmp/bench_occ --seed 42 --vanilla \
  --max_steps 3000 --sampling occupancy --val_every 100000 \
  --ckpt_every 3000 --log_every 1000 --progress_frames 0

stage benchall python -u scripts/bench_eval.py --data_root /tmp/tex \
  --ckpt_dir /tmp/bench_van --occ_dir /tmp/bench_occ \
  --kp_dir /tmp/r4_kpdir --dir360 /tmp/r4_360win --data360 /tmp/u360 \
  --ipe_dir /tmp/r5_ipe
echo R5D_ALL_DONE
