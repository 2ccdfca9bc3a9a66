#!/bin/bash
# JAX side of the FULL-GEOMETRY PSNR head-to-head (VERDICT r2 #1b).
# Recipe identical to scripts/h2h_full_torch.sh: same textured scenes, same
# seeds, 300 steps @ 1024 rays, nc=64 nf=128, 3 validation frames.
# PyTorch and JAX RNG streams differ, so the comparison is the PSNR
# *trajectory* at matched validation steps, not bitwise (SURVEY §7).
set -x
STEPS=300
COMMON="--max_steps $STEPS --rays_per_batch 1024 \
  --nc 64 --nf 128 --raw_noise_std 1.0 --sigma_activation relu \
  --white_bkgd true --lr 5e-4 --infinite_last_bin false \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 75 --val_indices 0,1,2 --val_res_scale 0.5 --log_every 25"
LLFF="--use_ndc --ndc_near_plane_world 1.0 --sample_from_single_frame \
  --precrop_iters 75 --precrop_frac 0.5 --holdout_every 4"

for SEED in 42 43; do
  python -m nerf_sandbox_tpu.scripts.train_nerf \
    --data_kind blender --data_root /tmp/h2h_spheres_tex \
    --out_dir /tmp/h2h_full/jax_spheres_s$SEED --seed $SEED $COMMON
  echo "H2H_JAX_SPHERES_S${SEED}_DONE"
  python -m nerf_sandbox_tpu.scripts.train_nerf \
    --data_kind llff --data_root /tmp/h2h_llff_tex \
    --out_dir /tmp/h2h_full/jax_llff_s$SEED --seed $SEED $COMMON $LLFF
  echo "H2H_JAX_LLFF_S${SEED}_DONE"
done
echo H2H_JAX_FULL_DONE
