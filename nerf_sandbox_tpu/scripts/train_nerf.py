"""Training / rendering CLI entry point.

Parity target: ``nerf_sandbox/source/scripts/train_nerf.py:383-423``
(``main``): parse flags → vanilla profile → path defaults → Trainer →
optional resume → ``--render_only`` short-circuit → train.

Usage (same shape as the reference):

    # Blender (synthetic)
    python -m nerf_sandbox_tpu.scripts.train_nerf \
        --data_kind blender --data_root /path/to/lego \
        --out_dir ./exp/lego_vanilla --vanilla --use_tb

    # LLFF (fern)
    python -m nerf_sandbox_tpu.scripts.train_nerf \
        --data_kind llff --data_root /path/to/fern --downscale 8 \
        --use_ndc --ndc_near_plane_world 1.0 --vanilla --use_tb \
        --out_dir ./exp/fern_vanilla
"""

from __future__ import annotations

from pathlib import Path

from nerf_sandbox_tpu.config import (
    apply_path_defaults, apply_vanilla_profile, build_argparser,
    explicit_flag_names, make_cfg_from_args, warn_noop_flags)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    cfg = make_cfg_from_args(args)
    explicit = explicit_flag_names(argv)
    warn_noop_flags(explicit)

    # Resolve 'auto' BEFORE the vanilla profile: its dataset-specific branch
    # (NDC, precrop, white bkgd, single-frame) keys off the real kind.
    kind = (cfg.data_kind or "auto").lower()
    if kind == "auto":
        kind = "llff" if (Path(cfg.data_root) / "poses_bounds.npy").exists() \
            else "blender"
        cfg.data_kind = kind
        if cfg.centering is None:
            cfg.centering = "auto" if kind == "llff" else "none"

    if cfg.vanilla:
        cfg = apply_vanilla_profile(cfg, explicit=explicit)
    cfg = apply_path_defaults(cfg, kind)

    Path(cfg.out_dir).mkdir(parents=True, exist_ok=True)

    if cfg.multihost:
        # MUST precede the Trainer's first backend touch (jax.devices())
        from nerf_sandbox_tpu.parallel.dist import initialize_multihost
        initialize_multihost(cfg.coordinator_address,
                             cfg.num_processes or None,
                             cfg.process_id if cfg.process_id >= 0 else None)

    from nerf_sandbox_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)

    if cfg.resume:
        which = str(cfg.resume)
        if which.lower() == "latest":
            trainer.load_latest_checkpoint(load_optim=not cfg.resume_no_optim)
        else:
            trainer.load_checkpoint(Path(which),
                                    load_optim=not cfg.resume_no_optim)

    if cfg.render_only:
        from nerf_sandbox_tpu.render.validation import ValidationRenderer
        valr = ValidationRenderer(
            scene_val=trainer.scene_val,
            out_dir=Path(cfg.out_dir) / "render_only",
            render_tile=trainer.render_tile, cfg=cfg,
            near_world=trainer.near_world, far_world=trainer.far_world,
            use_ndc=trainer.use_ndc,
            ndc_near_plane_world=trainer.ndc_near_plane_world,
            convention=trainer.camera_convention,
            tb_logger=trainer.tb_logger, eval_chunk=int(cfg.eval_chunk),
            cancel_flag_getter=lambda: trainer.signals.cancel_render)
        if trainer.sampling_mode == "occupancy" and \
                not getattr(trainer, "_occ_grid_restored", False):
            trainer._rebuild_occupancy(0)        # grid-less checkpoint
        valr.render_camera_path_video(
            *trainer.eval_params(), video_name="camera_path", overwrite=True)
        if cfg.export_mesh:
            trainer.export_mesh_obj(int(trainer.state.step))
        return

    trainer.train()


if __name__ == "__main__":
    main()
