#!/bin/bash
# Quality rows for the two newest capabilities (round 3 tail):
#   DYNAMIC — 4-D k-planes (--kp_time_res) on the moving-spheres scene
#     (tests/make_dynamic_scene.py): a static encoder must fail on
#     time-varying supervision, the 4-D one must not.
#   POSE    — camera refinement (--pose_opt [+ --barf_anneal_steps]) on a
#     textured scene whose TRAIN poses carry a 2 deg / 0.05u se3 jitter
#     (scripts/perturb_poses.py); the val split stays clean.
# Recipe matches the round-3 textured matrix (3k steps, 1024 rays,
# nc=64/nf=128, cosine 5e-4->5e-6, val on held-out frames). Run with the
# TPU free (ONE JAX process at a time).
set -x
STEPS=${STEPS:-3000}
DYN=${DYN:-/tmp/dyn_scene}
TEX=${TEX:-/tmp/tex_clean}
JIT=${JIT:-/tmp/tex_jitpose}
OUT=${OUT:-/tmp/dynpose_runs}
COMMON="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500 --white_bkgd true"
KP="--sampling occupancy --encoder kplanes --lr_grid 1e-2"

[ -d "$DYN" ] || python tests/make_dynamic_scene.py "$DYN" \
    --views 60 --size 128 --val_views 3
[ -d "$TEX" ] || python tests/make_sphere_scene.py "$TEX" \
    --textured --views 30 --size 128 --val_views 3
[ -d "$JIT" ] || python scripts/perturb_poses.py "$TEX" "$JIT" \
    --rot_deg 2.0 --trans 0.05 --seed 0

run() { # name data extra...
  local name=$1 data=$2; shift 2
  if [ -n "$ONLY" ] && [[ "$name" != *"$ONLY"* ]]; then return; fi
  if [ -e "$OUT/$name/.done" ]; then echo "DP_${name}_SKIP"; return; fi
  mkdir -p "$OUT/$name"
  if python -u -m nerf_sandbox_tpu.scripts.train_nerf \
      --data_root "$data" --out_dir "$OUT/$name" --seed 42 $COMMON "$@" \
      > "$OUT/$name/run.log" 2>&1; then
    grep -E "^\[VAL\]|loss=nan" "$OUT/$name/run.log" | tail -6
    touch "$OUT/$name/.done"
    echo "DP_${name}_DONE"
  else
    tail -5 "$OUT/$name/run.log"
    echo "DP_${name}_FAILED"
  fi
}

# ---- dynamic: one-flag diff (time_res 0 vs 16) on the moving scene ----
run dyn_static "$DYN" $KP
run dyn_t16    "$DYN" $KP --kp_time_res 16

# ---- pose: clean ref, jittered base, jittered + pose_opt(+BARF) ----
run pose_clean "$TEX"
run pose_jit   "$JIT"
run pose_opt   "$JIT" --pose_opt true --barf_anneal_steps 600
run pose_opt_nb "$JIT" --pose_opt true

echo DP_ALL_DONE
