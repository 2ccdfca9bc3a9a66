#!/bin/bash
# Torch-reference LONG-HORIZON run for the BLENDER-side asymptote question
# (VERDICT r4 #6): the 300-step textured-spheres h2h left both curves near
# their knee (+0.14/+0.32 dB) — run the torch side of the SAME recipe to
# T_max=1200 so the cosine fully decays and the endpoint is an asymptote,
# mirroring scripts/h2h_torch_asymptote.sh (which settled LLFF: repo
# +0.74 dB above the converged torch endpoint).
#
# Scene: /tmp/tex (make_sphere_scene.py --textured --views 30 --size 128
# --val_views 3 — the quality-matrix scene, so the numbers line up with
# the matrix). Background-CPU job (~15-20 s/step => ~5-6.5 h), nice -19.
# Hygiene per CLAUDE.md: no grep|tail on the run, .done only on success.
set -x
export PYTHONPATH=/root/reference
export OMP_NUM_THREADS=1
STEPS=${STEPS:-1200}
SEED=${SEED:-42}
OUT=/tmp/h2h_full/ref_spheres_long_s$SEED
mkdir -p "$OUT"
if nice -n 19 python -m nerf_sandbox.source.scripts.train_nerf \
    --data_kind blender --data_root /tmp/tex \
    --out_dir "$OUT" --seed $SEED --device cpu \
    --max_steps $STEPS --rays_per_batch 1024 \
    --nc 64 --nf 128 --raw_noise_std 1.0 --sigma_activation relu \
    --white_bkgd true --lr 5e-4 \
    --lr_scheduler cosine \
    --lr_scheduler_params "{\"T_max\":$STEPS,\"eta_min\":5e-6}" \
    --val_every 150 --val_indices 0,1,2 --val_res_scale 0.5 \
    --log_every 50 \
    > "$OUT/run.log" 2>&1; then
  touch "$OUT/.done"
  echo "H2H_TORCH_BLENDER_LONG_S${SEED}_DONE"
else
  tail -30 "$OUT/run.log"
  echo "H2H_TORCH_BLENDER_LONG_S${SEED}_FAILED"
fi
