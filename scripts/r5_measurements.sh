#!/bin/bash
# Round-5 TPU measurement stages (run AFTER scripts/r4b_measurements.sh
# drains — ONE JAX process at a time through the axon tunnel).
# Stages:
#   ipetrain — 3k bounded --ipe run (the +3.11 dB quality leader) for bench
#   ipebench — XLA-IPE vs round-5 in-kernel-IPE eval s/frame rows
#   h2hjax   — JAX side of the blender asymptote h2h (1200 steps, mirrors
#              scripts/h2h_blender_asymptote.sh's torch run on /tmp/tex)
#   evalfused/evalxla — SAME win360 ckpt scored through the fused-bf16
#              kernel vs the XLA path: isolates how much of any val-PSNR
#              drift vs the round-3 winner row is the eval path (bf16
#              kernel became the contracted-kplanes default in fa61378)
#              vs the training trajectory (scan_steps=16 default)
#   guard43  — seed-43 proposal+kp-hybrid collapse run: the bad-basin
#              divergence detector must fire a [WARN] in a REAL run
#              (VERDICT r4 #5 'fails loudly'); config = RESULTS
#              'Distortion-loss collapse' §5 distortion-1e-3 row
#   benchreg — bench.py regression guard
set -x
cd "$(dirname "$0")/.."
STEPS=${STEPS:-3000}
ONLY_STAGE=${ONLY_STAGE:-}
MARK=/tmp/r5_marks; mkdir -p "$MARK"

stage() { # name cmd...
  local name=$1; shift
  if [ -n "$ONLY_STAGE" ] && [[ "$name" != *"$ONLY_STAGE"* ]]; then return; fi
  if [ -e "$MARK/$name.done" ]; then echo "R5_${name}_SKIP"; return; fi
  if "$@" > "/tmp/r5_$name.log" 2>&1; then
    touch "$MARK/$name.done"; echo "R5_${name}_DONE"
  else
    tail -8 "/tmp/r5_$name.log"; echo "R5_${name}_FAILED"
  fi
}

IPEFLAGS="--max_steps $STEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd true --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$STEPS,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 500 --ipe true \
  --progress_frames 0"

# 600 steps, cosine fully decayed at T_max=600: the 1200-step torch side
# was infeasible on the contended 1-core host (40 s/step); 600 is still a
# decayed asymptote (slope measured over the 450->600 val events) and both
# sides run the SAME horizon
H2HSTEPS=${H2HSTEPS:-600}
H2HFLAGS="--max_steps $H2HSTEPS --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd true --lr 5e-4 \
  --infinite_last_bin false \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":$H2HSTEPS,\"eta_min\":5e-6} \
  --val_every 150 --val_indices 0,1,2 --val_res_scale 0.5 --log_every 50 \
  --progress_frames 0"

stage ipetrain python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_root /tmp/tex --out_dir /tmp/r5_ipe --seed 42 $IPEFLAGS
stage ipebench python -u scripts/bench_eval.py --data_root /tmp/tex \
  --skip_hier --ipe_dir /tmp/r5_ipe
stage h2hjax python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_kind blender --data_root /tmp/tex \
  --out_dir /tmp/h2h_full/jax_spheres_long_s42 --seed 42 $H2HFLAGS

GUARDFLAGS="--max_steps 3000 --rays_per_batch 1024 --nc 64 --nf 128 \
  --raw_noise_std 1.0 --sigma_activation relu --white_bkgd false --lr 5e-4 \
  --lr_scheduler cosine --lr_scheduler_params {\"T_max\":3000,\"eta_min\":5e-6} \
  --val_every 1000 --val_indices 0,1,2 --log_every 1000 \
  --scene_scale 0.25 --near_world 0.125 --far_world 22.5 --lindisp true \
  --scene_contraction true --distortion_weight 1e-3 \
  --sampling proposal --prop_anneal_steps 1000 \
  --encoder kplanes --kp_hybrid_freqs 6 --lr_grid 1e-2 \
  --progress_frames 0"
stage evalfused python -u -m nerf_sandbox_tpu.scripts.eval_nerf \
  --data_root /tmp/u360 --out_dir /tmp/r4_360win --split val --no_images \
  --eval_out /tmp/r4_360win/eval_fused
stage evalxla python -u -m nerf_sandbox_tpu.scripts.eval_nerf \
  --data_root /tmp/u360 --out_dir /tmp/r4_360win --split val --no_images \
  --eval_out /tmp/r4_360win/eval_xla --use_pallas false

# the trainer prints to stdout (captured in /tmp/r5_guard43.log by stage);
# after the stage, grep the log for '[WARN] val PSNR stalled' — the row's
# claim is that the warning FIRES in a real collapsed run
stage guard43 python -u -m nerf_sandbox_tpu.scripts.train_nerf \
  --data_root /tmp/u360 --out_dir /tmp/r5_guard43 --seed 43 $GUARDFLAGS
stage benchreg python -u bench.py

echo R5_ALL_DONE
