#!/bin/bash
# Encoder/sampling quality matrix on the TEXTURED scenes (VERDICT r2 #1c):
# high-frequency content (checker/noise-mapped spheres + checkered ground,
# tests/make_sphere_scene.py --textured) is where the fast encoder families
# must earn their claims. 3k steps each, same recipe across rows; val PSNR
# on 3 held-out frames. Blender-style matrix + LLFF/NDC matrix.
# Run AFTER any other TPU job finishes (one JAX process at a time).
set -x
STEPS=${STEPS:-3000}
BL=/tmp/h2h_spheres_tex
LL=/tmp/h2h_llff_tex
OUT=${OUT:-/tmp/qmatrix}
COMMON="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd true --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500"
LLFF="--use_ndc --ndc_near_plane_world 1.0 --sample_from_single_frame \
  --precrop_iters 500 --precrop_frac 0.5 --holdout_every 4"

run() { # name data_root extra...
  local name=$1 root=$2; shift 2
  python -m nerf_sandbox_tpu.scripts.train_nerf \
    --data_root "$root" --out_dir "$OUT/$name" --seed 42 $COMMON "$@" \
    2>&1 | grep -E "^\[VAL\]|\[occ\]|\[proposal\]|loss=nan|ERROR" | tail -8
  echo "QMATRIX_${name}_DONE"
}

# ---- blender-style (bounded 360) ----
run bl_hier       $BL
run bl_occ        $BL --sampling occupancy
run bl_kp_occ     $BL --sampling occupancy --encoder kplanes --lr_grid 1e-2
run bl_hash_occ   $BL --sampling occupancy --encoder hashgrid --lr_grid 1e-2
run bl_prop       $BL --sampling proposal
run bl_prop_ann   $BL --sampling proposal --prop_anneal_steps 1000
run bl_prop_ann_c $BL --sampling proposal --prop_anneal_steps 1000 \
                      --scene_contraction true

# ---- LLFF / NDC (forward-facing) ----
run ll_hier       $LL $LLFF
run ll_kp_occ     $LL $LLFF --sampling occupancy --encoder kplanes --lr_grid 1e-2
run ll_prop       $LL $LLFF --sampling proposal
run ll_prop_ann   $LL $LLFF --sampling proposal --prop_anneal_steps 1000

echo QMATRIX_ALL_DONE
