#!/bin/bash
# JAX side of the PSNR head-to-head (VERDICT r1 #2).
# Recipe identical to scripts/h2h_torch.sh: same scenes, same seed-class,
# same optimizer/schedule/sampling knobs, 400 steps @ 128 rays/batch.
# PyTorch and JAX RNG streams differ, so the comparison is the PSNR
# *trajectory* at matched validation steps, not bitwise (SURVEY §7).
# infinite_last_bin is passed explicitly (false) to match the reference's
# non-vanilla default.
set -x
COMMON="--seed 42 --max_steps 400 --rays_per_batch 128 \
  --nc 32 --nf 64 --raw_noise_std 1.0 --sigma_activation relu \
  --white_bkgd true --lr 5e-4 --infinite_last_bin false \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":400,\"eta_min\":5e-6} \
  --val_every 100 --val_res_scale 0.5 --log_every 50"
python -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_kind blender --data_root /tmp/h2h_spheres \
  --out_dir /tmp/h2h/jax_spheres $COMMON
python -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_kind llff --data_root /tmp/h2h_llff \
  --out_dir /tmp/h2h/jax_llff $COMMON \
  --use_ndc --ndc_near_plane_world 1.0 --sample_from_single_frame \
  --precrop_iters 100 --precrop_frac 0.5
echo H2H_JAX_DONE
