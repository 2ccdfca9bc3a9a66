#!/bin/bash
# Round-4b TPU measurement queue — the rows still open after the /tmp wipe
# (committed RESULTS rows stand; these are the ones that never ran or that
# code changes invalidated). Sequential, ONE JAX process at a time
# (CLAUDE.md tunnel rule). Outage-hardened: per-run logs, .done markers in
# the run dirs (not /tmp root), failures surface loudly, re-running resumes.
# Stages:
#   win360   — unbounded-360 winner train (kp-hybrid+occ+contr) for bench
#   kpdir    — bounded kplanes+occ train for bench
#   bench    — scripts/bench_eval.py fused kplanes + fused 360 rows
#   scan     — scripts/bench_scan_steps.py dispatch-amortization sweep
#   ipefix   — contracted-IPE re-measurement with the exact rank-one
#              Gaussian pushforward (3a3577a); controls = round-3 numbers
#   japp     — 3k appearance run on the exposure-jittered scene
#   appbase  — mean-code eval of japp (baseline renders kept for half-PSNR)
#   appref   — --refine_appearance eval of japp (NeRF-W half protocol)
#   posescene/poseopt/refine — pose-jitter scene, --pose_opt train,
#              --refine_pose alignment eval
set -x
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=axon
STEPS=${STEPS:-3000}
ONLY_STAGE=${ONLY_STAGE:-}
MARK=/tmp/r4b_marks; mkdir -p "$MARK"

stage() { # name cmd...
  local name=$1; shift
  if [ -n "$ONLY_STAGE" ] && [[ "$name" != *"$ONLY_STAGE"* ]]; then return; fi
  if [ -e "$MARK/$name.done" ]; then echo "R4B_${name}_SKIP"; return; fi
  if "$@" > "/tmp/r4b_$name.log" 2>&1; then
    touch "$MARK/$name.done"; echo "R4B_${name}_DONE"
  else
    tail -8 "/tmp/r4b_$name.log"; echo "R4B_${name}_FAILED"
  fi
}

WINFLAGS="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd false --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500 \
  --scene_scale 0.25 --near_world 0.125 --far_world 22.5 --lindisp true \
  --sampling occupancy --scene_contraction true --distortion_weight 0.01 \
  --occ_explore_anneal 1000 --encoder kplanes --lr_grid 1e-2 \
  --kp_hybrid_freqs 6"

KPFLAGS="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd true --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500 \
  --sampling occupancy --encoder kplanes --lr_grid 1e-2 \
  --n_layers 3 --hidden_dim 128 --skip_pos 1"

POSEFLAGS="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500 --white_bkgd true"

mk_posescene() {
  [ -d /tmp/tex_jitpose ] || JAX_PLATFORMS=cpu python scripts/perturb_poses.py \
      /tmp/tex /tmp/tex_jitpose --rot_deg 2.0 --trans 0.05 --seed 0
}

stage win360 python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_root /tmp/u360 --out_dir /tmp/r4_360win --seed 42 $WINFLAGS
stage kpdir python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_root /tmp/tex --out_dir /tmp/r4_kpdir --seed 42 $KPFLAGS
stage bench python -u scripts/bench_eval.py --data_root /tmp/tex \
  --skip_hier --kp_dir /tmp/r4_kpdir --dir360 /tmp/r4_360win \
  --data360 /tmp/u360
stage scan python -u scripts/bench_scan_steps.py
stage ipefix env OUT=/tmp/ipefix_runs ONLY=u_ bash scripts/ipe_360.sh
stage japp env ONLY=jit_app bash scripts/app_sh_quality.sh
stage appbase python -u -m nerf_sandbox_tpu.scripts.eval_nerf \
  --data_root /tmp/tex_jit --out_dir /tmp/app_runs/jit_app --split val \
  --eval_out /tmp/app_runs/jit_app/eval_base
stage appref python -u -m nerf_sandbox_tpu.scripts.eval_nerf \
  --data_root /tmp/tex_jit --out_dir /tmp/app_runs/jit_app --split val \
  --eval_out /tmp/app_runs/jit_app/eval_refine --no_images \
  --refine_appearance 150
stage posescene mk_posescene
stage poseopt python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_root /tmp/tex_jitpose --out_dir /tmp/dynpose_runs/pose_opt_nb \
  --seed 42 $POSEFLAGS --pose_opt true
stage refine python -u -m nerf_sandbox_tpu.scripts.eval_nerf \
  --data_root /tmp/tex_jitpose --out_dir /tmp/dynpose_runs/pose_opt_nb \
  --split val --eval_out /tmp/dynpose_runs/pose_opt_nb/eval_refine \
  --refine_pose 200 --no_images

echo R4B_ALL_DONE
