#!/bin/bash
# Torch-reference side of the FULL-GEOMETRY PSNR head-to-head (VERDICT r2 #1b):
# the vanilla recipe's real shapes — 1024 rays/batch, nc=64 nf=128 — on the
# TEXTURED scenes (checker/noise spheres + checkered ground disc,
# tests/make_sphere_scene.py --textured), 3 validation frames, 2 seeds.
# 300 steps is what CPU torch affords on this container's single core
# (~20-30 s/step measured => ~2 h/run); at 1024 rays/step that is 1.2x the
# total rays of the r2 2000-step x 128-ray horizon, which had converged.
# Runs are ordered so a timeout still leaves complete seed-42 evidence.
# infinite_last_bin stays at the reference's non-vanilla default (False —
# it has no CLI flag there); the JAX side passes it explicitly.
set -x
export PYTHONPATH=/root/reference
export OMP_NUM_THREADS=1
STEPS=300
COMMON="--device cpu --max_steps $STEPS --rays_per_batch 1024 \
  --nc 64 --nf 128 --raw_noise_std 1.0 --sigma_activation relu \
  --white_bkgd true --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 75 --val_indices 0,1,2 --val_res_scale 0.5 --log_every 25"
LLFF="--use_ndc --ndc_near_plane_world 1.0 --sample_from_single_frame \
  --precrop_iters 75 --precrop_frac 0.5 --holdout_every 4"

for SEED in 42 43; do
  nice -n 19 python -m nerf_sandbox.source.scripts.train_nerf \
    --data_kind blender --data_root /tmp/h2h_spheres_tex \
    --out_dir /tmp/h2h_full/ref_spheres_s$SEED --seed $SEED $COMMON
  echo "H2H_TORCH_SPHERES_S${SEED}_DONE"
  nice -n 19 python -m nerf_sandbox.source.scripts.train_nerf \
    --data_kind llff --data_root /tmp/h2h_llff_tex \
    --out_dir /tmp/h2h_full/ref_llff_s$SEED --seed $SEED $COMMON $LLFF
  echo "H2H_TORCH_LLFF_S${SEED}_DONE"
done
echo H2H_TORCH_FULL_DONE
