#!/bin/bash
# IPE (mip-NeRF integrated positional encoding) measurement rows.
# Controls are the round-3 360-matrix winners (scripts/quality_matrix_360.sh:
# proposal+anneal+contraction+dist 0.01 normalized = 23.22 dB @3k;
# hierarchical same = 22.07) and the bounded textured-scene reference recipe
# (quality_matrix_tex.sh hier = 23.04). IPE rows differ by ONE flag (--ipe).
# Scenes: U=/tmp/u360 (make_360_scene.py), T=/tmp/tex (make_sphere_scene.py
# --textured). Run AFTER any other TPU job finishes (one JAX process).
set -x
STEPS=${STEPS:-3000}
U=${U:-/tmp/u360}
T=${T:-/tmp/tex}
OUT=${OUT:-/tmp/ipe_runs}
COMMON="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500"
UNBS="--white_bkgd false --scene_scale 0.25 --near_world 0.125 \
  --far_world 22.5 --lindisp true --scene_contraction true \
  --distortion_weight 0.01"

run() { # name data extra...
  local name=$1 data=$2; shift 2
  if [ -n "$ONLY" ] && [[ "$name" != *"$ONLY"* ]]; then return; fi
  if [ -e "$OUT/$name/.done" ]; then echo "IPE_${name}_SKIP"; return; fi
  mkdir -p "$OUT/$name"
  # full log kept per run; failures must surface, not mark .done
  if python -u -m nerf_sandbox_tpu.scripts.train_nerf \
      --data_root "$data" --out_dir "$OUT/$name" --seed 42 $COMMON "$@" \
      > "$OUT/$name/run.log" 2>&1; then
    grep -E "^\[VAL\]|loss=nan" "$OUT/$name/run.log" | tail -6
    touch "$OUT/$name/.done"
    echo "IPE_${name}_DONE"
  else
    tail -5 "$OUT/$name/run.log"
    echo "IPE_${name}_FAILED"
  fi
}

# unbounded-360, normalized frame: IPE on the two positional winners
run u_hier_ipe  "$U" $UNBS --ipe true
run u_prop_ipe  "$U" $UNBS --sampling proposal --prop_anneal_steps 1000 --ipe true

# bounded textured blender-style: reference recipe +/- IPE
run t_hier_ipe  "$T" --white_bkgd true --ipe true

echo IPE_ALL_DONE
