"""Held-out-split evaluation CLI (`nerf-tpu-eval`).

Beyond-reference entry point: the torch reference evaluates only the
scheduled validation indices during training and a camera-path video via
``--render_only`` (train_nerf.py:410-417); there is no "render the whole
test split and report the paper-table numbers" pass. This adds one:

    python -m nerf_sandbox_tpu.scripts.eval_nerf \
        --data_root /path/to/lego --out_dir ./exp/lego_vanilla \
        --split test [--indices 0,5,12] [--res_scale 1.0] \
        [trainer-flag overrides...]

Loads the run's latest checkpoint and — new in round 4 — restores the
run's SAVED training configuration from the checkpoint's config echo, so
the architecture/encoder/sampling flags the run was trained with apply
automatically; any trainer flag passed on the eval command line overrides
the saved value (for eval-time knobs like ``--eval_chunk``). A run with
no checkpoint fails loudly (exit 2) instead of silently scoring random
weights. Renders every frame of the requested split through the normal
eval path (same renderer and PSNR/SSIM definitions as training-time
validation), saves rgb/opacity/depth triplets under
``<out_dir>/eval_<split>/`` and writes ``metrics.json`` (per-frame + mean
PSNR/SSIM). Prints the metrics dict as one JSON line on stdout.

Side-artifact hygiene: the Trainer is constructed ``eval_only`` (no
run_debug.json rewrite, no TB logdir) and the occupancy+kplanes eval-tile
compiler-bug clamp is inherited from the trainer (``_eval_chunk_init``)
rather than re-deriving raw ``cfg.eval_chunk`` — the flagship fast config
would otherwise crash on TPU at the default tile (ADVICE r3).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="Evaluate a trained run on a held-out split.")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out_dir", required=True,
                    help="the training run dir (contains checkpoints/)")
    ap.add_argument("--data_kind", default="auto")
    ap.add_argument("--split", default="test",
                    choices=("train", "val", "test"))
    ap.add_argument("--indices", default="all",
                    help="'all' or comma list of frame indices")
    ap.add_argument("--res_scale", type=float, default=1.0)
    ap.add_argument("--eval_out", default=None,
                    help="output dir (default <out_dir>/eval_<split>)")
    ap.add_argument("--no_images", action="store_true",
                    help="metrics only, skip PNG triplets")
    ap.add_argument("--no_saved_cfg", action="store_true",
                    help="ignore the checkpoint's saved config (flags-only "
                         "reconstruction, the pre-round-4 behavior)")
    ap.add_argument("--refine_pose", type=int, default=0, metavar="STEPS",
                    help="BARF test-time pose alignment: optimize each "
                         "eval camera's se3 delta against the frozen model "
                         "for STEPS Adam steps before scoring (the "
                         "evaluation protocol for --pose_opt runs)")
    ap.add_argument("--refine_pose_lr", type=float, default=5e-3)
    ap.add_argument("--refine_pose_rays", type=int, default=1024)
    ap.add_argument("--refine_appearance", type=int, default=0,
                    metavar="STEPS",
                    help="NeRF-W per-image appearance protocol: optimize "
                         "each eval frame's appearance code on the LEFT "
                         "half of its pixels for STEPS Adam steps, render "
                         "with it folded in, and report psnr_heldout_half "
                         "on the RIGHT half (needs --appearance_dim > 0 "
                         "at train time)")
    ap.add_argument("--refine_appearance_lr", type=float, default=1e-2)
    ap.add_argument("--refine_appearance_rays", type=int, default=1024)
    args, extra = ap.parse_known_args(argv)

    from nerf_sandbox_tpu.config import (apply_path_defaults,
                                         build_argparser, make_cfg_from_args)
    from nerf_sandbox_tpu.train import checkpoints as ckpt

    # ---- fail loudly before any device work if there is nothing to score
    peek = ckpt.peek_checkpoint_meta(args.out_dir)
    if peek is None:
        print(f"[EVAL] ERROR: no checkpoint found under {args.out_dir} — "
              "refusing to evaluate randomly-initialized params",
              file=sys.stderr)
        sys.exit(2)
    saved_step, saved_cfg = peek

    kind = args.data_kind
    if kind == "auto":
        kind = saved_cfg.get("data_kind") if not args.no_saved_cfg else None
        if not kind or str(kind).lower() == "auto":
            kind = "llff" if (Path(args.data_root)
                              / "poses_bounds.npy").exists() else "blender"
    trainer_argv = ["--data_root", args.data_root, "--out_dir", args.out_dir,
                    "--data_kind", str(kind), "--val_split", args.split,
                    *extra]
    tr_ap = build_argparser()
    if not args.no_saved_cfg and saved_cfg:
        # restore the run's trained config as the DEFAULT layer: explicit
        # eval-time flags (in trainer_argv) still win, and the eval-CLI's
        # own paths/splits are always explicit above
        dests = {a.dest for a in tr_ap._actions}
        restored = {k: v for k, v in saved_cfg.items()
                    if k in dests and k not in
                    ("data_root", "out_dir", "val_split", "resume")}
        tr_ap.set_defaults(**restored)
        print(f"[EVAL] restored {len(restored)} config fields from the "
              f"step-{saved_step} checkpoint (pass --no_saved_cfg to skip)")
    cfg = make_cfg_from_args(tr_ap.parse_args(trainer_argv))
    cfg = apply_path_defaults(cfg, kind)

    from nerf_sandbox_tpu.render.validation import ValidationRenderer
    from nerf_sandbox_tpu.train.trainer import Trainer

    tr = Trainer(cfg, eval_only=True)
    step = tr.load_latest_checkpoint(load_optim=False)
    if (tr.sampling_mode == "occupancy"
            and not getattr(tr, "_occ_grid_restored", False)):
        tr._rebuild_occupancy(step)          # grid-less (old-format) ckpt

    eval_out = Path(args.eval_out) if args.eval_out \
        else Path(args.out_dir) / f"eval_{args.split}"
    valr = ValidationRenderer(
        scene_val=tr.scene_val, out_dir=eval_out,
        render_tile=tr.render_tile,
        render_tile_scored=tr.render_tile_scored, cfg=cfg,
        near_world=tr.near_world, far_world=tr.far_world,
        use_ndc=tr.use_ndc, ndc_near_plane_world=tr.ndc_near_plane_world,
        convention=tr.camera_convention, tb_logger=None,
        eval_chunk=tr._eval_chunk_init)

    indices = None if args.indices.strip().lower() == "all" else \
        [int(i) for i in args.indices.split(",") if i != ""]
    refiner = None
    if args.refine_pose > 0:
        from nerf_sandbox_tpu.render.pose_refine import make_pose_refiner
        refiner = make_pose_refiner(tr.eval_hyper, tr.pos_bands,
                                    tr.dir_bands)
    app_refiner = None
    if args.refine_appearance > 0:
        if not tr.app_dim:
            print("[EVAL] ERROR: --refine_appearance needs a run trained "
                  "with --appearance_dim > 0", file=sys.stderr)
            sys.exit(2)
        from nerf_sandbox_tpu.render.app_refine import make_appearance_refiner
        # pool BEFORE refining: eval_hyper.enc_cfg is the POOLED config when
        # --eval_kp_pool > 1, so the refiner's forward (and the tile renderer
        # receiving its folded output) must see pooled plane tables; pooling
        # only touches pos_grid and fold_appearance only color_fc, so the two
        # compose (mirrors eval_params(); ADVICE r4 medium)
        app_refiner = make_appearance_refiner(
            tr.eval_hyper, tr.pos_bands, tr.dir_bands,
            model_cfg=tr.model_cfg,
            params_f_raw=tr._pool_eval_grid(tr.state.params_f),
            code0=tr._eval_app_vec())
    pc, pf = tr.eval_params()
    metrics = valr.evaluate_split(pc, pf, indices=indices,
                                  res_scale=args.res_scale,
                                  split_name=args.split,
                                  save_images=not args.no_images,
                                  pose_refiner=refiner,
                                  refine_steps=args.refine_pose,
                                  refine_lr=args.refine_pose_lr,
                                  refine_rays=args.refine_pose_rays,
                                  app_refiner=app_refiner,
                                  app_refine_steps=args.refine_appearance,
                                  app_refine_lr=args.refine_appearance_lr,
                                  app_refine_rays=args.refine_appearance_rays)
    metrics["step"] = int(step)
    metrics["out_dir"] = str(eval_out)
    (eval_out / "metrics.json").write_text(json.dumps(metrics, indent=2))
    print(json.dumps({k: v for k, v in metrics.items() if k != "frames"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
