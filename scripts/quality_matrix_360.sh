#!/bin/bash
# Unbounded-360 quality matrix (ROADMAP #5 remainder): contraction's UPSIDE
# on its intended geometry class — tests/make_360_scene.py (foreground
# checker spheres + infinite ground + hills at r=12-25 + sky shell at r=80,
# content depth [~2, 84]). Same 3k recipe as quality_matrix_tex.sh; val
# PSNR over 3 held-out frames. The "naive" row is the reference's
# situation: a bounded [2, 6] linear window pointed at an unbounded scene.
# Run AFTER any other TPU job finishes (one JAX process at a time).
set -x
STEPS=${STEPS:-3000}
U=${U:-/tmp/u360}
OUT=${OUT:-/tmp/qmatrix360}
COMMON="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd false --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500"
UNB="--near_world 0.5 --far_world 90 --lindisp true"

run() { # name extra...   (ONLY=<substr> filters rows; completed rows skip)
  local name=$1; shift
  if [ -n "$ONLY" ] && [[ "$name" != *"$ONLY"* ]]; then return; fi
  if [ -e "$OUT/$name/.qmatrix_done" ]; then
    echo "QMATRIX360_${name}_SKIP (done)"; return
  fi
  python -m nerf_sandbox_tpu.scripts.train_nerf \
    --data_root "$U" --out_dir "$OUT/$name" --seed 42 $COMMON "$@" \
    2>&1 | grep -E "^\[VAL\]|\[proposal\]|loss=nan|ERROR" | tail -8
  touch "$OUT/$name/.qmatrix_done"
  echo "QMATRIX360_${name}_DONE"
}

run u_naive                             # bounded [2,6] linear window (= reference capability)
run u_hier        $UNB
run u_hier_c      $UNB --scene_contraction true
run u_prop_ann    $UNB --sampling proposal --prop_anneal_steps 1000
run u_prop_ann_c  $UNB --sampling proposal --prop_anneal_steps 1000 \
                       --scene_contraction true

# distortion-loss ablation (the floater fix the first matrix motivated)
run u_hier_c_d01      $UNB --scene_contraction true --distortion_weight 0.01
run u_prop_ann_d01    $UNB --sampling proposal --prop_anneal_steps 1000 \
                           --distortion_weight 0.01
run u_prop_ann_c_d01  $UNB --sampling proposal --prop_anneal_steps 1000 \
                           --scene_contraction true --distortion_weight 0.01
run u_prop_ann_c_d10  $UNB --sampling proposal --prop_anneal_steps 1000 \
                           --scene_contraction true --distortion_weight 0.1

# contracted occupancy grid (NerfAcc-360): the fast family on the
# unbounded scene — grid tiles contracted ±2 space, kplanes aabb=2
run u_occ_c_d01       $UNB --sampling occupancy --scene_contraction true \
                           --distortion_weight 0.01 --occ_explore_anneal 1000
run u_kp_occ_c_d01    $UNB --sampling occupancy --scene_contraction true \
                           --distortion_weight 0.01 --occ_explore_anneal 1000 \
                           --encoder kplanes --lr_grid 1e-2

# mip-360 NORMALIZED rows: contraction assumes the cameras fit in the
# unit ball (Barron 2022 §2). scene_scale 0.25 puts the r=4 orbit at r=1
# and the whole foreground inside the contraction's identity region;
# near/far scale with it (0.5·0.25, 90·0.25).
UNBS="--scene_scale 0.25 --near_world 0.125 --far_world 22.5 --lindisp true"
run u_hier_c_d01_s      $UNBS --scene_contraction true --distortion_weight 0.01
run u_prop_ann_c_d01_s  $UNBS --sampling proposal --prop_anneal_steps 1000 \
                              --scene_contraction true --distortion_weight 0.01
run u_kp_occ_c_d01_s    $UNBS --sampling occupancy --scene_contraction true \
                              --distortion_weight 0.01 --occ_explore_anneal 1000 \
                              --encoder kplanes --lr_grid 1e-2

echo QMATRIX360_ALL_DONE
