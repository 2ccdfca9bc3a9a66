#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 #2/#3/#5/#7), sequential —
# ONE JAX process at a time (CLAUDE.md tunnel rule). Each stage is
# outage-hardened: per-run logs, .done markers only on success, failures
# surface loudly and the queue moves on (re-running the script resumes).
# Stages:
#   scenes    — build /tmp/u360, /tmp/tex, /tmp/tex_jit (CPU)
#   ipe       — scripts/ipe_360.sh            (3 runs: IPE rows)
#   app       — scripts/app_sh_quality.sh     (4 runs: appearance + SH)
#   win360    — train the unbounded-360 winner (kp-hybrid+occ, 25.38 recipe)
#   kpdir     — train a bounded kplanes+occ run for the eval bench
#   bench     — scripts/bench_eval.py (fused kplanes + fused 360 rows)
#   scan      — scripts/bench_scan_steps.py (dispatch-amortization sweep)
#   refine    — nerf-tpu-eval --refine_pose on the pose_opt_nb run
set -x
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=axon
STEPS=${STEPS:-3000}
ONLY_STAGE=${ONLY_STAGE:-}

stage() { # name cmd...
  local name=$1; shift
  if [ -n "$ONLY_STAGE" ] && [[ "$name" != *"$ONLY_STAGE"* ]]; then return; fi
  if [ -e "/tmp/r4_done_$name" ]; then echo "R4_${name}_SKIP"; return; fi
  if "$@" > "/tmp/r4_$name.log" 2>&1; then
    touch "/tmp/r4_done_$name"; echo "R4_${name}_DONE"
  else
    tail -8 "/tmp/r4_$name.log"; echo "R4_${name}_FAILED"
  fi
}

mk_scenes() {
  [ -d /tmp/u360 ] || JAX_PLATFORMS=cpu python tests/make_360_scene.py /tmp/u360 || return 1
  [ -d /tmp/tex ] || JAX_PLATFORMS=cpu python tests/make_sphere_scene.py /tmp/tex \
      --textured --views 30 --size 128 --val_views 3 || return 1
  [ -d /tmp/tex_jit ] || JAX_PLATFORMS=cpu python tests/make_sphere_scene.py /tmp/tex_jit \
      --textured --views 30 --size 128 --val_views 3 --exposure_jitter 0.35 || return 1
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

H2HFLAGS="--data_kind llff --max_steps 1200 --rays_per_batch 1024 \
  --nc 64 --nf 128 --raw_noise_std 1.0 --sigma_activation relu \
  --white_bkgd true --lr 5e-4 --infinite_last_bin false \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":1200,\"eta_min\":5e-6} \
  --val_every 150 --val_indices 0,1,2 --val_res_scale 0.5 --log_every 50 \
  --use_ndc --ndc_near_plane_world 1.0 --sample_from_single_frame \
  --precrop_iters 75 --precrop_frac 0.5 --holdout_every 4"

stage scenes mk_scenes
stage h2hjax python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_root /tmp/h2h_llff_tex --out_dir /tmp/h2h_full/jax_llff_long_s42 \
  --seed 42 $H2HFLAGS
stage ipe  bash scripts/ipe_360.sh
stage app  bash scripts/app_sh_quality.sh
stage win360 python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_root /tmp/u360 --out_dir /tmp/r4_360win --seed 42 $WINFLAGS
stage kpdir python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_root /tmp/tex --out_dir /tmp/r4_kpdir --seed 42 $KPFLAGS
stage bench python -u scripts/bench_eval.py --data_root /tmp/tex \
  --skip_hier --kp_dir /tmp/r4_kpdir --dir360 /tmp/r4_360win \
  --data360 /tmp/u360
stage scan python -u scripts/bench_scan_steps.py
stage refine python -u -m nerf_sandbox_tpu.scripts.eval_nerf \
  --data_root /tmp/tex_jitpose --out_dir /tmp/dynpose_runs/pose_opt_nb \
  --split val --refine_pose 200 --no_images

echo R4_ALL_DONE
