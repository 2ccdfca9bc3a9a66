#!/bin/bash
# Torch-reference side of the PSNR head-to-head (VERDICT r1 #2).
# Identical recipe to the JAX side (scripts/h2h_jax.sh), scaled to what CPU
# torch affords on this container's SINGLE core (~6 s/step at this size):
# 128 rays/batch, nc=32 nf=64, 400 steps, vanilla knobs otherwise.
# infinite_last_bin stays at the reference's non-vanilla default (False —
# it has no CLI flag there); the JAX side passes it explicitly.
set -x
export PYTHONPATH=/root/reference
export OMP_NUM_THREADS=1
COMMON="--device cpu --seed 42 --max_steps 400 --rays_per_batch 128 \
  --nc 32 --nf 64 --raw_noise_std 1.0 --sigma_activation relu \
  --white_bkgd true --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":400,\"eta_min\":5e-6} \
  --val_every 100 --val_res_scale 0.5 --log_every 50"
nice -n 19 python -m nerf_sandbox.source.scripts.train_nerf \
  --data_kind blender --data_root /tmp/h2h_spheres \
  --out_dir /tmp/h2h/ref_spheres $COMMON
nice -n 19 python -m nerf_sandbox.source.scripts.train_nerf \
  --data_kind llff --data_root /tmp/h2h_llff \
  --out_dir /tmp/h2h/ref_llff $COMMON \
  --use_ndc --ndc_near_plane_world 1.0 --sample_from_single_frame \
  --precrop_iters 100 --precrop_frac 0.5
echo H2H_TORCH_DONE
