#!/bin/bash
# kp-hybrid under PROPOSAL sampling: can a persistent uniform floor on the
# proposal resample PDF (--prop_explore_floor, occupancy's explore_frac
# analogue) close the 17.35-vs-25.38 gap (RESULTS.md "Unbounded-360" #6)?
# Hypothesis: proposal placement + multiplicative plane init is a positive
# feedback loop — planes only get gradient where the proposal puts samples,
# and the proposal chases the (noisy) plane density. Occupancy works
# because its explore floor is persistent. Same normalized 3k recipe as
# quality_matrix_360.sh. Run with no other TPU job active.
set -x
STEPS=${STEPS:-3000}
U=${U:-/tmp/u360}
OUT=${OUT:-/tmp/propfloor360}
COMMON="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd false --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 1000 \
  --scene_scale 0.25 --near_world 0.125 --far_world 22.5 --lindisp true \
  --scene_contraction true --distortion_weight 0.01 \
  --sampling proposal --prop_anneal_steps 1000"
HYB="--encoder kplanes --kp_hybrid_freqs 6 --lr_grid 1e-2"

run() { # name extra...
  local name=$1; shift
  if [ -n "$ONLY" ] && [[ "$name" != *"$ONLY"* ]]; then return; fi
  if [ -e "$OUT/$name/.done" ]; then echo "PF_${name}_SKIP"; return; fi
  python -m nerf_sandbox_tpu.scripts.train_nerf \
    --data_root "$U" --out_dir "$OUT/$name" --seed 42 $COMMON "$@" \
    2>&1 | grep -E "^\[VAL\]|loss=nan|ERROR" | tail -6
  touch "$OUT/$name/.done"
  echo "PF_${name}_DONE"
}

run kph_f00 $HYB                              # control (expect ~17.35)
run kph_f03 $HYB --prop_explore_floor 0.3
run kph_f05 $HYB --prop_explore_floor 0.5
run pos_f03 --prop_explore_floor 0.3          # does the floor hurt positional? (23.22 baseline)

echo PF_ALL_DONE
