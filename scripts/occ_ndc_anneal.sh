#!/bin/bash
# NDC occupancy bootstrap, round 2 (ROADMAP #6): does the ANNEALED explore
# floor (--occ_explore_anneal: stratified -> grid-driven blend) recover the
# ~1.3 dB the static 0.5 floor still trails hierarchical by on the LLFF
# textured scene — and does it let the static floor drop (better late-game
# concentration)?  Baselines from quality_matrix_tex.sh: hierarchical
# 23.66 @3k, occupancy+0.5-floor ~26.2 on the smooth scene.
# Run AFTER any other TPU job finishes (one JAX process at a time).
set -x
STEPS=${STEPS:-3000}
LL=${LL:-/tmp/h2h_llff_tex}
OUT=${OUT:-/tmp/occ_ndc}
COMMON="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd true --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500 \
  --use_ndc --ndc_near_plane_world 1.0 --sample_from_single_frame \
  --precrop_iters 500 --precrop_frac 0.5 --holdout_every 4 \
  --sampling occupancy"

run() { # name extra...
  local name=$1; shift
  if [ -e "$OUT/$name/.done" ]; then echo "OCC_NDC_${name}_SKIP"; return; fi
  python -m nerf_sandbox_tpu.scripts.train_nerf \
    --data_root "$LL" --out_dir "$OUT/$name" --seed 42 $COMMON "$@" \
    2>&1 | grep -E "^\[VAL\]|\[occ\]|loss=nan|ERROR" | tail -6
  touch "$OUT/$name/.done"
  echo "OCC_NDC_${name}_DONE"
}

run static05                                 # current NDC default (floor 0.5)
run ann1k_f05   --occ_explore_anneal 1000    # anneal on top of the default
run ann1k_f10   --occ_explore_anneal 1000 --occ_explore_frac 0.1
run ann2k_f02   --occ_explore_anneal 2000 --occ_explore_frac 0.02
run ann1k_f02   --occ_explore_anneal 1000 --occ_explore_frac 0.02

echo OCC_NDC_ALL_DONE
