#!/bin/bash
# Appearance-embedding + SH-view-encoder measurement rows.
# Scenes: TJ=/tmp/tex_jit (make_sphere_scene.py --textured
# --exposure_jitter 0.35 — per-TRAIN-frame gain in [0.65,1.35], val clean),
# T=/tmp/tex (clean textured control). Recipe = the round-3 textured-matrix
# reference row (quality_matrix_tex.sh hier = 23.04 @3k); measurement rows
# differ by ONE flag each. Run with the TPU free (one JAX process).
set -x
STEPS=${STEPS:-3000}
TJ=${TJ:-/tmp/tex_jit}
T=${T:-/tmp/tex}
OUT=${OUT:-/tmp/app_runs}
COMMON="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500 --white_bkgd true"

run() { # name data extra...
  local name=$1 data=$2; shift 2
  if [ -n "$ONLY" ] && [[ "$name" != *"$ONLY"* ]]; then return; fi
  if [ -e "$OUT/$name/.done" ]; then echo "APP_${name}_SKIP"; return; fi
  mkdir -p "$OUT/$name"
  if python -u -m nerf_sandbox_tpu.scripts.train_nerf \
      --data_root "$data" --out_dir "$OUT/$name" --seed 42 $COMMON "$@" \
      > "$OUT/$name/run.log" 2>&1; then
    grep -E "^\[VAL\]|loss=nan" "$OUT/$name/run.log" | tail -6
    touch "$OUT/$name/.done"
    echo "APP_${name}_DONE"
  else
    tail -5 "$OUT/$name/run.log"
    echo "APP_${name}_FAILED"
  fi
}

# exposure-jittered scene: the code-free baseline eats the gain variance,
# the coded model absorbs it into the table (eval = mean code)
run jit_base "$TJ"
run jit_app  "$TJ" --appearance_dim 16
# clean-scene control: codes should be ~free when there is nothing to absorb
run tex_app  "$T" --appearance_dim 16
# SH view encoder on the clean textured scene (quality parity check vs the
# 23.04 freq reference row; 16 vs 27 dir dims)
run tex_sh   "$T" --dir_enc sh --sh_degree 4

echo APP_ALL_DONE
