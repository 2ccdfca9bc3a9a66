#!/bin/bash
# Round-5 TPU measurement stages (run AFTER scripts/r4b_measurements.sh
# drains — ONE JAX process at a time through the axon tunnel).
# Stages:
#   ipetrain — 3k bounded --ipe run (the +3.11 dB quality leader) for bench
#   ipebench — XLA-IPE vs round-5 in-kernel-IPE eval s/frame rows
#   h2hjax   — JAX side of the blender asymptote h2h (1200 steps, mirrors
#              scripts/h2h_blender_asymptote.sh's torch run on /tmp/tex)
#   benchreg — bench.py regression guard
set -x
cd "$(dirname "$0")/.."
STEPS=${STEPS:-3000}
ONLY_STAGE=${ONLY_STAGE:-}
MARK=/tmp/r5_marks; mkdir -p "$MARK"

stage() { # name cmd...
  local name=$1; shift
  if [ -n "$ONLY_STAGE" ] && [[ "$name" != *"$ONLY_STAGE"* ]]; then return; fi
  if [ -e "$MARK/$name.done" ]; then echo "R5_${name}_SKIP"; return; fi
  if "$@" > "/tmp/r5_$name.log" 2>&1; then
    touch "$MARK/$name.done"; echo "R5_${name}_DONE"
  else
    tail -8 "/tmp/r5_$name.log"; echo "R5_${name}_FAILED"
  fi
}

IPEFLAGS="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd true --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500 --ipe true \
  --progress_frames 0"

H2HFLAGS="--max_steps 1200 --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd true --lr 5e-4 \
  --infinite_last_bin false \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":1200,\"eta_min\":5e-6} \
  --val_every 150 --val_indices 0,1,2 --val_res_scale 0.5 --log_every 50 \
  --progress_frames 0"

stage ipetrain python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_root /tmp/tex --out_dir /tmp/r5_ipe --seed 42 $IPEFLAGS
stage ipebench python -u scripts/bench_eval.py --data_root /tmp/tex \
  --skip_hier --ipe_dir /tmp/r5_ipe
stage h2hjax python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_kind blender --data_root /tmp/tex \
  --out_dir /tmp/h2h_full/jax_spheres_long_s42 --seed 42 $H2HFLAGS
stage benchreg python -u bench.py

echo R5_ALL_DONE
