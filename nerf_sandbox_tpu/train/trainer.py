"""Trainer: end-to-end training orchestration.

Parity target: ``nerf_sandbox/source/train/trainer.py:151-872`` — the same
lifecycle: loader auto-detect (poses_bounds.npy → LLFF), scene loading with
val→test→train fallback, near/far resolution (LLFF percentiles | Blender
2/6 | CLI override), sampler & model construction, Adam + cosine schedule,
signals, TensorBoard, ValidationRenderer + power-law schedule, startup
``run_debug.json``, the step loop with resume fast-forwarding, scheduled
validation + progress blocks, checkpointing, dual ETA (train + predicted
validation time), and post-training video exports.

TPU-first differences:
* the hot loop body is ONE jitted XLA program (train/step.py) containing
  sampling + both forwards + PDF resample + loss + Adam — the host loop
  only ticks the schedule, logging and checkpoints
* device metrics are fetched sparsely (every ``log_every`` steps) so the
  host never blocks the device pipeline on step k's results
* AMP GradScaler is unnecessary (bf16 on TPU needs no loss scaling); the
  thermal guard is replaced by an HBM monitor with the same hook shape
* multi-chip: params replicated, ray batch sharded over the ``data`` mesh.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import asdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.config import Config
from nerf_sandbox_tpu.core.encoding import encoder_out_dim, make_frequency_bands
from nerf_sandbox_tpu.data.blender_loader import BlenderSceneLoader
from nerf_sandbox_tpu.data.llff_loader import LLFFSceneLoader
from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
from nerf_sandbox_tpu.models.mlp import NeRFConfig, param_count
from nerf_sandbox_tpu.parallel.mesh import make_mesh
from nerf_sandbox_tpu.render.renderer import EvalHyper, make_tile_renderer
from nerf_sandbox_tpu.render.validation import ValidationRenderer
from nerf_sandbox_tpu.train import checkpoints as ckpt
from nerf_sandbox_tpu.train.schedule import build_validation_steps, fast_forward
from nerf_sandbox_tpu.train.step import (
    TrainHyper, build_train_step, init_train_state, make_optimizer)
from nerf_sandbox_tpu.utils.debug import dump_run_debug
from nerf_sandbox_tpu.utils.device_monitor import DeviceMonitor
from nerf_sandbox_tpu.utils.signals import SignalController, install_signal_handlers
from nerf_sandbox_tpu.utils.tb import TensorBoardLogger


def _fmt_eta(seconds: float) -> str:
    seconds = max(0.0, float(seconds))
    h, rem = divmod(int(seconds), 3600)
    m, s = divmod(rem, 60)
    return f"{h:02d}:{m:02d}:{s:02d}"


class Trainer:
    def __init__(self, cfg: Config, *, eval_only: bool = False) -> None:
        """``eval_only``: constructed for inference over an existing run's
        out_dir (scripts/eval_nerf.py) — skip the side artifacts a TRAINING
        run owns (run_debug.json dump, TensorBoard logdir) so evaluating a
        run never rewrites its training-time artifacts with eval-time
        config."""
        from nerf_sandbox_tpu.parallel import dist
        self.cfg = cfg
        self.eval_only = bool(eval_only)
        self.out_dir = Path(cfg.out_dir)
        # Multi-process: checkpoints/TB come from process 0 only; non-main
        # processes still render collectively (a mesh-wide program must be
        # dispatched on every process) but write under out_dir/procN so a
        # shared filesystem stays race-free (parallel/dist.py policy).
        self.is_main = dist.is_main_process()
        self._main_out_dir = self.out_dir
        if dist.is_multiprocess():
            print(f"[dist] process {dist.process_index()}/"
                  f"{dist.process_count()} "
                  f"({jax.local_device_count()} local device(s))")
            if cfg.async_val:
                print("[dist] --async_val is single-process only (collective "
                      "dispatch ordering); forcing synchronous validation")
                cfg.async_val = False
            if str(getattr(cfg, "ckpt_backend", "npz")) == "orbax":
                # orbax's save/restore of global (cross-process) arrays is
                # a COLLECTIVE — every process must enter it, but this
                # trainer's checkpoint policy is process-0-only writes, so
                # process 0 would block forever at orbax's sync barrier.
                # The npz backend is safe: replicated arrays are fully
                # addressable on process 0 alone.
                print("[dist] --ckpt_backend orbax is single-process only "
                      "(collective save vs process-0-only writes would "
                      "deadlock); forcing the npz backend")
                cfg.ckpt_backend = "npz"
            if not self.is_main:
                self.out_dir = self.out_dir / f"proc{dist.process_index()}"
        self.out_dir.mkdir(parents=True, exist_ok=True)

        # ---- mesh (before data: the frame-sharded scene bank and the
        #      per-host image_filter need the device layout) ----
        devices = jax.devices()
        if cfg.mesh_devices and cfg.mesh_devices > 0:
            devices = devices[:cfg.mesh_devices]
        n_slices = int(getattr(cfg, "mesh_slices", 0) or 0)
        n_model = int(getattr(cfg, "mesh_model", 0) or 0)
        if n_slices > 1 and n_model > 1:
            raise ValueError("--mesh_slices and --mesh_model are mutually "
                             "exclusive (pick DCN-hierarchical data or "
                             "data x model)")
        if n_slices > 1:
            from nerf_sandbox_tpu.parallel.mesh import make_mesh_multihost
            assert len(devices) % n_slices == 0, \
                f"{len(devices)} devices not divisible by {n_slices} slices"
            self.plan = make_mesh_multihost(n_slices,
                                            len(devices) // n_slices,
                                            devices)
        elif n_model > 1:
            from nerf_sandbox_tpu.parallel.mesh import make_mesh_2d
            assert len(devices) % n_model == 0, \
                f"{len(devices)} devices not divisible by model={n_model}"
            self.plan = make_mesh_2d(len(devices) // n_model, n_model,
                                     devices)
        else:
            self.plan = make_mesh(devices)
        print(f"[mesh] {self.plan.n_devices} device(s), "
              f"backend={jax.default_backend()}"
              + (f", {n_slices} slices (dcn_data x ici_data)"
                 if n_slices > 1 else "")
              + (f", data x {n_model} model (trunk TP + grid F-sharding)"
                 if n_model > 1 else ""))

        # Frame-sharded scene bank: HBM /= data devices, host decode /=
        # processes. "auto" = only when multi-process (single-process
        # replication is free and keeps the gather local).
        shard_pref = str(getattr(cfg, "shard_scene", "auto")).lower()
        self.shard_scene = (shard_pref == "true" or
                            (shard_pref == "auto" and dist.is_multiprocess()))
        if self.shard_scene and self.plan.mesh is None:
            print("[data] note: --shard_scene needs a multi-device mesh; "
                  "keeping the replicated scene bank")
            self.shard_scene = False

        # ---- data ----
        kind = (cfg.data_kind or "auto").lower()
        if kind == "auto":
            is_llff = (Path(cfg.data_root) / "poses_bounds.npy").exists()
        else:
            is_llff = kind == "llff"
        self.is_llff = is_llff
        self.data_kind = "llff" if is_llff else "blender"

        if is_llff:
            self.loader = LLFFSceneLoader(
                cfg.data_root, downscale=cfg.downscale, white_bkgd=cfg.white_bkgd,
                bd_factor=cfg.bd_factor, use_llff_holdout=cfg.use_llff_holdout,
                holdout_every=cfg.holdout_every, holdout_offset=cfg.holdout_offset)
        else:
            self.loader = BlenderSceneLoader(
                cfg.data_root, downscale=cfg.downscale, white_bkgd=cfg.white_bkgd,
                centering=(cfg.centering or "none"), scene_scale=cfg.scene_scale)
        self.camera_convention = cfg.camera_convention or \
            getattr(self.loader, "camera_convention", "opengl")

        img_filter = None
        if self.shard_scene and dist.is_multiprocess():
            # Per-host data loading: only decode the train frames this
            # process's devices own (the sharded bank never reads the rest).
            # The ownership set is one sharding-map construction per frame
            # COUNT, not per frame (loaders call the filter N times).
            from functools import lru_cache

            from nerf_sandbox_tpu.parallel.mesh import owned_frame_rows

            @lru_cache(maxsize=4)
            def _owned(n, _plan=self.plan):
                return owned_frame_rows(_plan, n)

            def img_filter(i, n):
                return i in _owned(n)

        self.scene_train = self.loader.load("train", image_filter=img_filter)
        val_split = str(getattr(cfg, "val_split", "auto") or "auto").lower()
        if val_split != "auto":
            # explicit split (--val_split): no fallback — a typo'd or
            # missing split should fail loudly, not silently validate on
            # train frames
            self.scene_val = (self.scene_train if (val_split == "train"
                              and not img_filter)
                              else self.loader.load(val_split))
        else:
            try:
                self.scene_val = self.loader.load("val")
            except FileNotFoundError:
                try:
                    self.scene_val = self.loader.load("test")
                except FileNotFoundError:
                    # filtered train frames have zero images — reload
                    # unfiltered for validation GT
                    self.scene_val = (self.loader.load("train")
                                      if img_filter else self.scene_train)
        if len(self.scene_val) == 0:
            self.scene_val = self.scene_train

        # ---- bounds (trainer.py:232-262) ----
        self.use_ndc = bool(cfg.use_ndc)
        if is_llff:
            if cfg.near_world is not None and cfg.far_world is not None:
                self.near_world, self.far_world = float(cfg.near_world), float(cfg.far_world)
            else:
                self.near_world, self.far_world = self.loader.get_global_near_far(
                    percentile=(cfg.llff_near_percentile, cfg.llff_far_percentile))
        else:
            self.near_world = float(cfg.near_world) if cfg.near_world is not None else 2.0
            self.far_world = float(cfg.far_world) if cfg.far_world is not None else 6.0
        self.ndc_near_plane_world = (float(cfg.ndc_near_plane_world)
                                     if cfg.ndc_near_plane_world is not None
                                     else self.near_world)
        if self.use_ndc:
            self.samp_near, self.samp_far = 0.0, 1.0
        else:
            self.samp_near, self.samp_far = self.near_world, self.far_world

        print(f"[rays] use_ndc={self.use_ndc} convention={self.camera_convention} "
              f"ndc_near_plane_world={self.ndc_near_plane_world:.3f} "
              f"samp=[{self.samp_near:.3f},{self.samp_far:.3f}] "
              f"world=[{self.near_world:.3f},{self.far_world:.3f}]")

        # ---- encoders / model config ----
        self.pos_bands = jnp.asarray(make_frequency_bands(cfg.pos_num_freqs))
        self.dir_bands = jnp.asarray(make_frequency_bands(cfg.dir_num_freqs))
        self.pos_encoder = (cfg.encoder if cfg.encoder in ("hashgrid", "kplanes")
                            else "freq")
        self.scene_contraction = bool(getattr(cfg, "scene_contraction", False))
        if self.scene_contraction and self.use_ndc:
            # NDC already maps the frustum into a bounded box; composing the
            # two warps double-compresses depth for no benefit.
            print("[cfg] note: --scene_contraction with --use_ndc is "
                  "redundant (NDC is already bounded); contraction disabled")
            self.scene_contraction = False
        if self.scene_contraction:
            # mip-NeRF 360 frame check: contraction is the identity inside
            # the unit ball and compresses everything outside — the camera
            # rig (and foreground) must sit INSIDE it. Measured on the
            # synthetic 360 scene: an r=4 orbit under contraction loses
            # ~9 dB vs the same run normalized to r=1 via --scene_scale
            # (RESULTS.md "Unbounded-360").
            eyes = np.asarray([f.c2w[:3, 3] for f in self.scene_train.frames],
                              np.float32)
            cam_r = float(np.mean(np.linalg.norm(eyes, axis=-1)))
            if cam_r > 1.25:
                print(f"[contract] WARNING: mean camera radius r={cam_r:.2f} "
                      "> 1 — contraction compresses the foreground. "
                      f"Normalize the rig into the unit ball with "
                      f"--scene_scale {1.0 / cam_r:.3g} (and scale "
                      "--near_world/--far_world to match)")
        self.lindisp = bool(getattr(cfg, "lindisp", False))
        if self.lindisp and self.samp_near <= 0:
            raise ValueError(
                f"--lindisp needs near > 0 (got near={self.samp_near}); "
                "disparity spacing divides by z")
        # mip-NeRF integrated positional encoding (anti-aliased freq
        # encoder): per-sample conical-frustum Gaussians from per-ray
        # pixel-cone radii (core/encoding.py). Freq encoder, non-NDC only.
        self.ipe = bool(getattr(cfg, "ipe", False))
        if self.ipe and self.use_ndc:
            print("[cfg] note: --ipe is unsupported under --use_ndc (pixel-"
                  "cone radii are undefined after the NDC warp); disabled")
            self.ipe = False
        if self.ipe and self.pos_encoder != "freq":
            print(f"[cfg] note: --ipe applies to the freq (positional) "
                  f"encoder only; disabled for --encoder {self.pos_encoder}")
            self.ipe = False
        if self.ipe and bool(getattr(cfg, "scene_contraction", False)):
            print("[cfg] WARNING: --ipe + --scene_contraction MEASURED to "
                  "lose 3.5-5.4 dB vs plain PE on unbounded-360 scenes even "
                  "with the exact rank-one Gaussian pushforward "
                  "(core/encoding.py:contract_gaussian; RESULTS.md "
                  "'Integrated positional encoding'). --ipe is a BOUNDED-"
                  "scene win (+3.1 dB); consider dropping it here")
        # NeRF-W appearance codes (per TRAIN frame; eval folds a fixed code
        # into the color head — mlp.py:fold_appearance)
        self.app_dim = int(getattr(cfg, "appearance_dim", 0) or 0)
        if self.app_dim > 0:
            mode = str(getattr(cfg, "eval_appearance", "mean")).strip().lower()
            if mode not in ("mean", "zero"):
                idx = int(mode)   # raises on junk — fail at init, not at val
                if not 0 <= idx < len(self.scene_train.frames):
                    raise ValueError(
                        f"--eval_appearance index {idx} out of range "
                        f"(0..{len(self.scene_train.frames) - 1})")
            print(f"[app] NeRF-W appearance codes: "
                  f"{len(self.scene_train.frames)} frames x {self.app_dim} "
                  f"(eval code: {mode})")
        # BARF-style camera refinement (core/pose.py)
        self.pose_opt = bool(getattr(cfg, "pose_opt", False))
        self.barf_anneal = int(getattr(cfg, "barf_anneal_steps", 0) or 0)
        if self.barf_anneal > 0 and (self.pos_encoder != "freq" or self.ipe):
            print("[cfg] note: --barf_anneal_steps applies to the plain "
                  "freq positional encoder only; disabled")
            self.barf_anneal = 0
        if self.pose_opt:
            print(f"[pose] BARF-style refinement of "
                  f"{len(self.scene_train.frames)} train poses "
                  f"(lr {float(getattr(cfg, 'pose_lr', 1e-3)):g}); "
                  "validation keeps the dataset's val poses")
            if self.barf_anneal == 0 and self.pos_encoder == "freq" \
                    and not self.ipe:
                print("[pose] hint: --pose_opt without --barf_anneal_steps "
                      "can diverge from bad initial poses (full-frequency "
                      "gradients are basin-less; tests/test_pose.py "
                      "measures it) — try --barf_anneal_steps ~ 20% of "
                      "max_steps")
        self.enc_cfg = None
        if self.pos_encoder == "hashgrid":
            from nerf_sandbox_tpu.models.hashgrid import HashGridConfig
            aabb = float(cfg.hash_aabb_scale)
            if self.scene_contraction and aabb < 2.0:
                print("[cfg] scene_contraction: hash_aabb_scale raised to "
                      "2.0 (contracted coords span the radius-2 ball)")
                aabb = 2.0
            self.enc_cfg = HashGridConfig(
                n_levels=cfg.hash_levels, n_features=cfg.hash_features,
                log2_table_size=cfg.hash_log2_size, base_res=cfg.hash_base_res,
                max_res=cfg.hash_max_res, aabb_scale=aabb)
            enc_pos_dim = self.enc_cfg.out_dim
        elif self.pos_encoder == "kplanes":
            from nerf_sandbox_tpu.models.kplanes import KPlanesConfig
            aabb = float(cfg.kp_aabb_scale)
            if self.scene_contraction and \
                    int(getattr(cfg, "kp_hybrid_freqs", 0) or 0) == 0:
                # default is 6 since round 5 — reaching here means the user
                # explicitly disabled the hybrid on the one scene family
                # where it is transformative
                print("[cfg] WARNING: --kp_hybrid_freqs 0 on a CONTRACTED "
                      "scene measures ~11 dB WORSE than the default 6 (the "
                      "enclosing background shell contaminates plane "
                      "projections; RESULTS.md 'Unbounded-360' #5)")
            if self.scene_contraction and aabb < 2.0:
                print("[cfg] scene_contraction: kp_aabb_scale raised to "
                      "2.0 (contracted coords span the radius-2 ball)")
                aabb = 2.0
            time_res = int(getattr(cfg, "kp_time_res", 0) or 0)
            if time_res > 0:
                times = [f.time for f in self.scene_train.frames]
                n_timed = sum(t is not None for t in times)
                if n_timed == 0:
                    print("[cfg] WARNING: --kp_time_res set but no frame in "
                          "the dataset carries a 'time' field — every ray "
                          "trains at t=0 and the time axis stays untrained. "
                          "Use a D-NeRF-format dataset (per-frame "
                          "normalized time in transforms_*.json).")
                else:
                    print(f"[dyn] 4-D kplanes: time_res={time_res}, "
                          f"{n_timed}/{len(times)} frames carry times "
                          f"(range {min(t for t in times if t is not None):.3f}"
                          f"..{max(t for t in times if t is not None):.3f})")
            # grid TP (--mesh_model): the einsum contraction forms keep the
            # feature axis sharded (KPlanesConfig.shard_features docstring);
            # single-chip keeps the 19%-faster reshape matmul
            tp_grid = (self.plan.mesh is not None
                       and "model" in self.plan.mesh.axis_names)
            self.enc_cfg = KPlanesConfig(
                plane_res=tuple(int(r) for r in
                                str(cfg.kp_plane_res).split(",") if r),
                plane_features=cfg.kp_plane_features,
                line_res=cfg.kp_line_res, line_features=cfg.kp_line_features,
                aabb_scale=aabb,
                hybrid_freqs=int(getattr(cfg, "kp_hybrid_freqs", 0) or 0),
                time_res=time_res, shard_features=tp_grid)
            enc_pos_dim = self.enc_cfg.out_dim
        else:
            enc_pos_dim = encoder_out_dim(3, cfg.pos_num_freqs,
                                          cfg.pos_include_input)
        # view-direction encoder family (freq = reference; sh = spherical
        # harmonics, core/encoding.py:sh_encoding)
        self.dir_encoder = str(getattr(cfg, "dir_enc", "freq") or "freq")
        self.sh_degree = int(getattr(cfg, "sh_degree", 4) or 4)
        if self.dir_encoder == "sh":
            if not 1 <= self.sh_degree <= 4:
                raise ValueError(f"--sh_degree {self.sh_degree} not in 1..4")
            enc_dir_dim = self.sh_degree ** 2
            print(f"[enc] view dirs: spherical harmonics degree "
                  f"{self.sh_degree} ({enc_dir_dim} dims)")
        else:
            enc_dir_dim = encoder_out_dim(3, cfg.dir_num_freqs,
                                          cfg.dir_include_input)
        if (int(getattr(cfg, "kp_time_res", 0) or 0) > 0
                and self.pos_encoder != "kplanes"):
            print("[cfg] note: --kp_time_res has no effect without "
                  "--encoder kplanes")
        self.dynamic = (self.pos_encoder == "kplanes"
                        and int(getattr(cfg, "kp_time_res", 0) or 0) > 0)
        self.model_cfg = NeRFConfig(
            enc_pos_dim=enc_pos_dim, enc_dir_dim=enc_dir_dim,
            n_layers=cfg.n_layers, hidden_dim=cfg.hidden_dim,
            skip_pos=cfg.skip_pos, app_dim=self.app_dim)

        # ---- sampler spec (vanilla forces N_rand=1024 single-frame/precrop;
        #      trainer.py:277-306) ----
        rays_per_batch = 1024 if cfg.vanilla else int(cfg.rays_per_batch)
        if self.shard_scene:
            self.scene_arrays = SceneArrays.from_scene_sharded(
                self.scene_train, self.plan)
            n_img = self.scene_arrays.images.shape[0]
            hw = self.scene_arrays.hw
            c = self.scene_arrays.images.shape[-1]
            mb = n_img * hw[0] * hw[1] * c / 1e6
            print(f"[data] image bank frame-sharded over "
                  f"{self.plan.n_devices} device(s): "
                  f"{mb:.0f} MB total -> {mb / self.plan.n_devices:.0f} "
                  f"MB/device")
        else:
            self.scene_arrays = SceneArrays.from_scene(self.scene_train)
        self.spec = RayBatchSpec(
            rays_per_batch=rays_per_batch,
            image_h=self.scene_train.H, image_w=self.scene_train.W,
            convention=self.camera_convention, as_ndc=self.use_ndc,
            near_plane=self.ndc_near_plane_world, white_bkgd=cfg.white_bkgd,
            single_frame=bool(cfg.sample_from_single_frame or
                              (cfg.vanilla and self.is_llff)),
            precrop_iters=int(cfg.precrop_iters),
            precrop_frac=float(cfg.precrop_frac),
            shard_frames=self.shard_scene)

        # ---- sampling strategy (occupancy grid replaces the coarse pass) ----
        self.sampling_mode = str(cfg.sampling or "hierarchical")
        self.occ_cfg = None
        self.occ_grid = None
        self.occ_update = None
        if self.sampling_mode == "occupancy":
            from nerf_sandbox_tpu.models.occupancy import (
                OccupancyConfig, init_occupancy_grid)
            occ_contracted = False
            if self.use_ndc:
                lo, hi = (-1.0, -1.0, 0.0), (1.0, 1.0, 1.0)
            elif self.scene_contraction:
                # unbounded scene: the grid tiles CONTRACTED space — the
                # ±2 ball holds every finite world point, so the finite
                # grid covers the whole unbounded scene (NerfAcc-360
                # practice; models/occupancy.py)
                lo, hi = (-2.0, -2.0, -2.0), (2.0, 2.0, 2.0)
                occ_contracted = True
                print("[occ] scene_contraction: grid tiles contracted "
                      "space (covers the unbounded scene)")
            else:
                s = float(cfg.occ_aabb_scale)
                lo, hi = (-s, -s, -s), (s, s, s)
            if cfg.occ_explore_frac is None:
                # auto: NDC scenes keep thin content at the far plane in a
                # sub-cell shell; a cell that loses its occupancy mark then
                # never re-learns it. A large uniform floor recovers most
                # of the gap (measured 22.3 -> 26.2 dB @3k on the LLFF
                # sphere scene, RESULTS.md) while keeping the grid's
                # concentration benefit. Explicit values always win.
                explore = 0.5 if self.use_ndc else 0.02
                if self.use_ndc:
                    print("[occ] NDC: occ_explore_frac auto-set to 0.5 "
                          "(far-plane bootstrap; override with "
                          "--occ_explore_frac)")
            else:
                explore = float(cfg.occ_explore_frac)
            self.occ_cfg = OccupancyConfig(
                resolution=int(cfg.occ_res), lo=lo, hi=hi,
                decay=float(cfg.occ_decay),
                update_every=int(cfg.occ_update_every),
                n_probes=int(cfg.occ_probes),
                explore_frac=explore, lindisp=self.lindisp,
                contracted=occ_contracted)
            self.occ_grid = init_occupancy_grid(self.occ_cfg)
            print(f"[occ] grid {cfg.occ_res}^3 over {lo}..{hi}, "
                  f"update every {cfg.occ_update_every} steps")
            if not self.use_ndc and not occ_contracted:
                # Content outside the grid box is sampled only through the
                # explore floor (2%): geometry out there learns ~never and
                # PSNR silently plateaus (measured: the textured ground
                # disc at r=2.1 vs the default 1.5 box costs ~6 dB —
                # RESULTS.md). Warn when the camera rig could see past it.
                eyes = np.asarray([f.c2w[:3, 3] for f in
                                   self.scene_train.frames], np.float32)
                reach = float(self.samp_far) - float(
                    np.mean(np.linalg.norm(eyes, axis=-1)))
                if reach > float(cfg.occ_aabb_scale) * 1.05:
                    print(f"[occ] WARNING: rays reach ~r={reach:.1f} beyond "
                          f"the grid box (r={cfg.occ_aabb_scale:.1f}); "
                          "content outside it is only explore-floor "
                          "sampled. If PSNR stalls, raise "
                          "--occ_aabb_scale (and --kp_aabb_scale / "
                          "--hash_aabb_scale for grid encoders)")
            if self.use_ndc:
                print("[occ] NDC + occupancy: the 0.5 explore floor is "
                      "load-bearing (thin far-plane content needs it "
                      "persistently) — measured +0.4 dB over hierarchical "
                      "on textured LLFF with it, ~1 dB worse without "
                      "(RESULTS.md 'NDC occupancy explore floor')")

        # ---- proposal mode (mip-NeRF 360-style, beyond-reference) ----
        self.prop_model = None
        n_prop = 0
        if self.sampling_mode == "proposal":
            # proposal MLP is always freq-encoded (vanilla enc dims) — the
            # main model keeps whatever encoder family was selected
            prop_layers = int(cfg.prop_layers)
            self.prop_model = NeRFConfig(
                enc_pos_dim=encoder_out_dim(3, cfg.pos_num_freqs,
                                            cfg.pos_include_input),
                enc_dir_dim=enc_dir_dim,
                n_layers=prop_layers,
                hidden_dim=int(cfg.prop_hidden),
                skip_pos=max(1, min(prop_layers - 1, prop_layers // 2)))
            n_prop = int(cfg.prop_samples) or int(cfg.nc)
            print(f"[proposal] {self.prop_model.n_layers}x"
                  f"{self.prop_model.hidden_dim} density MLP, "
                  f"{n_prop} proposal samples/ray, interlevel weight "
                  f"{cfg.interlevel_weight}")

        # ---- train hyper + optimizer + state ----
        self.hyper = TrainHyper(
            model=self.model_cfg, nc=cfg.nc, nf=cfg.nf, det_fine=cfg.det_fine,
            raw_noise_std=float(cfg.raw_noise_std),
            sigma_activation=cfg.sigma_activation, white_bkgd=cfg.white_bkgd,
            infinite_last_bin=bool(cfg.infinite_last_bin),
            samp_near=self.samp_near, samp_far=self.samp_far,
            micro_chunks=int(cfg.train_micro_chunks or 0),
            pos_include_input=cfg.pos_include_input,
            dir_include_input=cfg.dir_include_input,
            compute_dtype=str(cfg.compute_dtype),
            pos_encoder=self.pos_encoder, enc_cfg=self.enc_cfg,
            sampling_mode=self.sampling_mode, occ_cfg=self.occ_cfg,
            occ_explore_anneal=int(getattr(cfg, "occ_explore_anneal", 0)
                                   or 0),
            prop_model=self.prop_model, n_prop=n_prop,
            interlevel_weight=float(cfg.interlevel_weight),
            prop_anneal_steps=int(getattr(cfg, "prop_anneal_steps", 0) or 0),
            prop_anneal_slope=float(getattr(cfg, "prop_anneal_slope", 10.0)),
            prop_explore_floor=float(getattr(cfg, "prop_explore_floor", 0.0)
                                     or 0.0),
            scene_contraction=self.scene_contraction,
            distortion_weight=float(getattr(cfg, "distortion_weight", 0.0)
                                    or 0.0),
            distortion_anneal_steps=int(
                getattr(cfg, "distortion_anneal_steps", 0) or 0),
            lindisp=self.lindisp, ipe=self.ipe,
            kp_tv_weight=(float(getattr(cfg, "kp_tv_weight", 0.0) or 0.0)
                          if self.pos_encoder == "kplanes" else 0.0),
            app_dim=self.app_dim,
            n_app_frames=len(self.scene_train.frames),
            dir_encoder=self.dir_encoder, sh_degree=self.sh_degree,
            pose_opt=self.pose_opt,
            n_pose_frames=len(self.scene_train.frames),
            barf_anneal_steps=self.barf_anneal)
        if (float(getattr(cfg, "kp_tv_weight", 0.0) or 0.0) > 0
                and self.pos_encoder != "kplanes"):
            print("[cfg] note: --kp_tv_weight has no effect without "
                  "--encoder kplanes")
        if (self.hyper.distortion_weight >= 5e-3
                and self.hyper.distortion_anneal_steps == 0
                and self.pos_encoder in ("kplanes", "hashgrid")
                and self.sampling_mode in ("proposal", "hierarchical")):
            # Measured (RESULTS.md "Distortion-loss collapse"): distortion
            # gradient exists only AT sample locations; importance-placed
            # samples cluster wherever the current histogram peaks, and a
            # fast grid encoder can chase the concentration reward into a
            # wrong-depth collapse (17.35 vs 25.35 dB @0.01 vs 0.001 on
            # the 360 scene). Occupancy's thresholded placement is immune.
            print(f"[cfg] WARNING: --distortion_weight "
                  f"{self.hyper.distortion_weight:g} with a grid encoder "
                  f"under {self.sampling_mode} sampling collapses to a "
                  "wrong-depth optimum (measured -8 dB). Use ~1e-3, add "
                  "--distortion_anneal_steps 1000, or --sampling occupancy "
                  "which is immune at 1e-2.")

        sched_params = dict(cfg.lr_scheduler_params or {})
        sched_params.setdefault("T_max", cfg.max_steps)
        grid_lr = float(getattr(cfg, "lr_grid", 0.0) or 0.0)
        grid_wd = float(getattr(cfg, "grid_weight_decay", 0.0) or 0.0)
        if ((grid_lr > 0 or grid_wd > 0)
                and self.pos_encoder not in ("hashgrid", "kplanes")):
            print("[cfg] note: --lr_grid/--grid_weight_decay have no effect "
                  "without a grid encoder (--encoder kplanes|hashgrid)")
            grid_lr = grid_wd = 0.0
        # decay target = the family's neutral element: kplanes features
        # combine multiplicatively (init ~N(1, 0.1)), hash tables additively
        grid_wd_target = 1.0 if self.pos_encoder == "kplanes" else 0.0
        self.tx = make_optimizer(cfg.lr, cfg.lr_scheduler, sched_params,
                                 grad_clip_norm=cfg.grad_clip_norm,
                                 grid_lr=grid_lr,
                                 grid_weight_decay=grid_wd,
                                 grid_decay_target=grid_wd_target,
                                 pose_lr=(float(getattr(cfg, "pose_lr", 0.0))
                                          if self.pose_opt else 0.0))
        self.lr_info = {"lr": cfg.lr, "scheduler": cfg.lr_scheduler,
                        "params": sched_params,
                        "grad_clip_norm": cfg.grad_clip_norm,
                        "lr_grid": grid_lr, "grid_weight_decay": grid_wd}

        init_acc = (None if cfg.vanilla or not cfg.initial_acc_opacity
                    else float(cfg.initial_acc_opacity))
        self.state = init_train_state(
            jax.random.PRNGKey(cfg.seed), self.hyper, self.tx,
            near=self.near_world, far=self.far_world,
            initial_acc_opacity=init_acc)
        n_params = param_count(self.state.params_c) + param_count(self.state.params_f)
        print(f"[model] 2x NeRF {cfg.n_layers}x{cfg.hidden_dim} skip@{cfg.skip_pos} "
              f"enc=({enc_pos_dim},{enc_dir_dim}) params={n_params:,}")
        self._apply_tp_shardings()

        if dist.is_multiprocess():
            # jit inputs must be GLOBAL arrays under multi-process SPMD;
            # params/opt-state/scene are identical on every process
            # (deterministic init / shared dataset), so each process's full
            # copy supplies its addressable shards.
            self.state = dist.replicate_to_mesh(self.plan, self.state)
            if not self.shard_scene:
                self.scene_arrays = dist.replicate_to_mesh(self.plan,
                                                           self.scene_arrays)
            if self.occ_grid is not None:
                self.occ_grid = dist.replicate_to_mesh(self.plan,
                                                       self.occ_grid)

        self.train_step = build_train_step(
            self.hyper, self.spec, self.tx, self.pos_bands, self.dir_bands,
            plan=self.plan, base_seed=cfg.seed)

        if self.sampling_mode == "occupancy":
            from nerf_sandbox_tpu.models.occupancy import make_occupancy_updater
            self.occ_update = make_occupancy_updater(
                self.model_cfg, self.pos_bands, self.dir_bands, self.occ_cfg,
                sigma_activation=cfg.sigma_activation,
                pos_include_input=cfg.pos_include_input,
                dir_include_input=cfg.dir_include_input,
                pos_encoder=self.pos_encoder, enc_cfg=self.enc_cfg,
                compute_dtype=jnp.dtype(cfg.compute_dtype),
                scene_contraction=self.scene_contraction,
                dir_encoder=self.dir_encoder, sh_degree=self.sh_degree,
                # dynamic scenes: grid = union of occupancy probed at
                # --occ_time_probes times (static: no time axis at all)
                dyn_times=tuple(
                    np.linspace(0.0, 1.0,
                                max(2, int(getattr(cfg, "occ_time_probes",
                                                   5) or 5))).tolist())
                if self.dynamic else ())

        # ---- eval renderer ----
        # kplanes eval-only plane pooling (--eval_kp_pool): the plane
        # contraction is 2QR^2F FLOPs — the dominant eval cost for this
        # family (VERDICT r2 #4). Training keeps full resolution; eval
        # renders resample the tables down (models/kplanes.py).
        self.eval_enc_cfg = self.enc_cfg
        if self.pos_encoder == "kplanes":
            # eval-scale measurement (scripts/bench_kplanes_encode.py):
            # chunk 8192 is ~8% faster than 32768 at 1M+ points and keeps
            # the (chunk, R, F) contraction intermediates 4x smaller
            self.eval_enc_cfg = self.eval_enc_cfg._replace(chunk=8192)
        self._kp_pool = int(getattr(cfg, "eval_kp_pool", 1) or 1)
        if self._kp_pool > 1 and self.pos_encoder == "kplanes":
            pooled = tuple(max(4, r // self._kp_pool)
                           for r in self.enc_cfg.plane_res)
            self.eval_enc_cfg = self.eval_enc_cfg._replace(plane_res=pooled)
            print(f"[eval] kplanes planes {self.enc_cfg.plane_res} -> "
                  f"{pooled} for eval renders (--eval_kp_pool "
                  f"{self._kp_pool})")
        elif self._kp_pool > 1:
            print("[cfg] note: --eval_kp_pool has no effect without "
                  "--encoder kplanes")
            self._kp_pool = 1
        self.eval_hyper = EvalHyper(
            # eval renders run the APP-FREE architecture: eval_params()
            # folds the fixed eval code into the color head, so XLA and
            # the fused Pallas kernel need no appearance branch
            model=self.model_cfg._replace(app_dim=0),
            nc_eval=cfg.nc, nf_eval=cfg.nf,
            white_bkgd=cfg.white_bkgd, sigma_activation=cfg.sigma_activation,
            infinite_last_bin=bool(cfg.infinite_last_bin),
            samp_near=self.samp_near, samp_far=self.samp_far,
            pos_include_input=cfg.pos_include_input,
            dir_include_input=cfg.dir_include_input,
            compute_dtype=str(cfg.compute_dtype),
            use_pallas=self._pallas_eval_ok(),
            eval_fine_frac=float(getattr(cfg, "eval_fine_frac", 1.0)),
            eval_ert_eps=float(getattr(cfg, "eval_ert_eps", 0.0)),
            pos_encoder=self.pos_encoder, enc_cfg=self.eval_enc_cfg,
            sampling_mode=self.sampling_mode, occ_cfg=self.occ_cfg,
            prop_model=self.prop_model,
            n_prop_eval=(n_prop or 64),
            scene_contraction=self.scene_contraction,
            lindisp=self.lindisp, ipe=self.ipe,
            dir_encoder=self.dir_encoder, sh_degree=self.sh_degree)
        self.render_tile = make_tile_renderer(
            self.eval_hyper, self.pos_bands, self.dir_bands, plan=self.plan)
        # Scored renders (val PSNR, eval CLI) go through the exact XLA path
        # when --val_exact (default). Post round-5 precision fix the fused
        # kernel scores within 0.001 dB of XLA (RESULTS.md "Scored-eval
        # path"), so this is scoring POLICY (XLA stays the oracle), not a
        # quality shield; videos and progress frames keep the kernel's
        # 1.5-1.6x throughput. Renderers are lazily jitted, so the second
        # variant only compiles if a scored render actually happens.
        if self.eval_hyper.use_pallas and bool(getattr(cfg, "val_exact",
                                                       True)):
            self.eval_hyper_scored = self.eval_hyper._replace(
                use_pallas=False)
            self.render_tile_scored = make_tile_renderer(
                self.eval_hyper_scored, self.pos_bands, self.dir_bands,
                plan=self.plan)
        else:
            self.eval_hyper_scored = self.eval_hyper
            self.render_tile_scored = self.render_tile

        # ---- aux services ----
        self.monitor = DeviceMonitor(enable_throttle=cfg.thermal_throttle,
                                     check_every=cfg.gpu_temp_check_every)
        self.signals = SignalController()
        install_signal_handlers(self.signals)
        self.tb_logger = TensorBoardLogger(
            enabled=cfg.use_tb and self.is_main and not self.eval_only,
            logdir=cfg.tb_logdir or str(self.out_dir / "tb"),
            image_max_side=cfg.tb_image_max_side)

        # ---- validation indices + renderer + schedule ----
        raw_idxs = cfg.val_indices
        if isinstance(raw_idxs, str) and raw_idxs.strip():
            self.val_frame_indices = [int(s) for s in raw_idxs.split(",")]
        elif isinstance(raw_idxs, (list, tuple)):
            self.val_frame_indices = [int(x) for x in raw_idxs]
        else:
            self.val_frame_indices = [0]

        eval_chunk = int(cfg.eval_chunk)
        if self.sampling_mode == "occupancy" and self.pos_encoder == "kplanes":
            # libtpu regalloc RET_CHECK (live_range_finder.cc:29) at
            # tile*nf >= 2^21 points in this branch (measured; same internal
            # compiler bug family as the B=4096 train step, CLAUDE.md) —
            # clamp the tile so the eval program stays under it.
            max_tile = max(1024, (1 << 20) // max(1, int(cfg.nf)))
            if eval_chunk > max_tile:
                print(f"[cfg] note: eval_chunk {eval_chunk} -> {max_tile} "
                      "(occupancy+kplanes eval-tile compiler-bug workaround)")
                eval_chunk = max_tile
        self.valr = ValidationRenderer(
            scene_val=self.scene_val, out_dir=self.out_dir / "validation",
            render_tile=self.render_tile,
            render_tile_scored=self.render_tile_scored, cfg=cfg,
            near_world=self.near_world, far_world=self.far_world,
            use_ndc=self.use_ndc,
            ndc_near_plane_world=self.ndc_near_plane_world,
            convention=self.camera_convention, tb_logger=self.tb_logger,
            eval_chunk=eval_chunk,
            cancel_flag_getter=lambda: self.signals.cancel_render)

        self.val_steps = build_validation_steps(
            cfg.max_steps, base_every=cfg.val_every,
            num_val_steps=cfg.num_val_steps, schedule=cfg.val_schedule,
            power=cfg.val_power)
        self._val_next_idx = 0
        self._val_avg_seconds = 0.0
        self._val_event_durations: list[float] = []
        # bad-basin detector state (_check_val_divergence)
        self._val_psnr_history: list[tuple[int, float]] = []
        self._divergence_warned = False
        # guards duration bookkeeping shared with the --async_val worker
        import threading
        self._val_stats_lock = threading.Lock()
        # --thermal_throttle restore target once HBM pressure clears
        self._eval_chunk_init = eval_chunk
        if self.val_steps:
            print(f"[VAL] first validation at step {self.val_steps[0]} "
                  f"(1/{len(self.val_steps)})")

        self.valr.setup_progress_plan(val_steps=self.val_steps,
                                      frames_subdir="training_progress")

        # ---- startup debug dump ----
        if self.eval_only:
            return          # inference: don't rewrite the run's debug dump
        try:
            dump_run_debug(
                self.out_dir, cfg=cfg, scene=self.scene_train,
                params_c=self.state.params_c, params_f=self.state.params_f,
                model_cfg=self.model_cfg, render_tile=self.render_tile,
                enc_dims={"pos": enc_pos_dim, "dir": enc_dir_dim},
                near=self.near_world, far=self.far_world, use_ndc=self.use_ndc,
                ndc_near_plane_world=self.ndc_near_plane_world,
                convention=self.camera_convention, lr_info=self.lr_info,
                probe_params=self.eval_params())
        except Exception as e:
            print(f"[DEBUG] run_debug dump failed: {e}")

    def _print_ray_norms(self, step: int) -> None:
        """First-100-step ray-norm sanity prints (trainer.py:886-893 role):
        regenerates the step's batch from the fold_in(seed, step) stream."""
        try:
            if not hasattr(self, "_ray_norm_fn"):
                from nerf_sandbox_tpu.data.sampler import sample_ray_batch
                spec, seed, plan = self.spec, self.cfg.seed, self.plan

                @jax.jit
                def _stats(scene, step):
                    key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
                    k_batch, _ = jax.random.split(key)
                    b = sample_ray_batch(k_batch, step, scene, spec, plan=plan)
                    w, m = b["rays_d_world_norm"], b["rays_d_marching_norm"]
                    return (w.min(), w.max(), m.min(), m.max())
                self._ray_norm_fn = _stats
            wmin, wmax, mmin, mmax = [
                float(v) for v in self._ray_norm_fn(
                    self.scene_arrays, jnp.asarray(step))]
            print(f"[RAYS] step {step}: |d_world| in [{wmin:.4f},{wmax:.4f}] "
                  f"|d_march| in [{mmin:.4f},{mmax:.4f}]")
        except Exception as e:
            print(f"[RAYS] norm debug failed: {e}")

    def _fine_sampling_diagnostic(self, step: int, n_rays: int = 128) -> None:
        """Every-500-steps hierarchical-sampling health check: % of fine
        samples landing in the top-4 coarse intervals vs the expected mass
        (debug_utils.py:348-432; trainer.py:937-979 call sites)."""
        try:
            import jax
            import jax.numpy as jnp
            from nerf_sandbox_tpu.core.sampling import (
                resample_midpoints, stratified_samples)
            from nerf_sandbox_tpu.data.sampler import sample_ray_batch
            from nerf_sandbox_tpu.models.forward import nerf_forward_pass
            from nerf_sandbox_tpu.utils.debug import fine_sample_topk_hit

            key = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 7), step)
            spec = self.spec._replace(rays_per_batch=n_rays)
            batch = sample_ray_batch(key, jnp.int32(step), self.scene_arrays,
                                     spec, plan=self.plan)
            z = jnp.broadcast_to(
                stratified_samples(self.samp_near, self.samp_far, self.cfg.nc,
                                   lindisp=self.lindisp),
                (n_rays, self.cfg.nc))
            _, w_c, _, _ = nerf_forward_pass(
                self.state.params_c, self.model_cfg, batch["rays_o_marching"],
                batch["rays_d_marching_unit"], z,
                pos_bands=self.pos_bands, dir_bands=self.dir_bands,
                pos_include_input=self.cfg.pos_include_input,
                dir_include_input=self.cfg.dir_include_input,
                white_bkgd=self.cfg.white_bkgd,
                ray_norms=batch["rays_d_marching_norm"],
                viewdirs_world_unit=batch["rays_d_world_unit"],
                sigma_activation=self.cfg.sigma_activation,
                infinite_last_bin=bool(self.cfg.infinite_last_bin),
                pos_encoder=self.pos_encoder, enc_cfg=self.enc_cfg,
                scene_contraction=self.scene_contraction,
                dir_encoder=self.dir_encoder, sh_degree=self.sh_degree)
            zf = resample_midpoints(z, w_c, self.cfg.nf, deterministic=True)
            # the hit metric needs the same bins/weights the sampler saw
            bins_mid = 0.5 * (z[:, 1:] + z[:, :-1])
            w_bins = 0.5 * (w_c[:, 1:] + w_c[:, :-1]) + 1e-5
            d = fine_sample_topk_hit(bins_mid, w_bins, zf, topk=4)
            print(f"[diag] step={step} fine samples in top-4 intervals: "
                  f"{d['hit_rate'] * 100:.1f}% (expected mass "
                  f"{d['expected_mass'] * 100:.1f}%)")
        except Exception as e:
            print(f"[diag] fine-sampling diagnostic failed: {e}")

    def _pallas_eval_ok(self) -> bool:
        """Fused Pallas ray-march for eval renders (default on; under
        --val_exact, PSNR-SCORED renders still use the exact XLA renderer —
        this gate then only governs progress/path-video throughput renders
        and opted-in kernel-scored runs): requires a
        real TPU backend, a frequency encoder, the fusable architecture
        family (hidden%128==0, one interior skip), and a data-only mesh —
        on a mesh the kernel runs per-device under shard_map (GSPMD has no
        partitioning rule for Mosaic custom calls); a tensor-parallel
        ``model`` axis would shard the MLP itself, which the fused kernel
        doesn't implement, so that case keeps the XLA eval path."""
        from nerf_sandbox_tpu.ops.fused_mlp import fusable, pallas_available
        data_only = (self.plan.mesh is None
                     or "model" not in self.plan.mesh.axis_names)
        # kplanes: the encode is fused in-kernel (one-hot matmul bilinear
        # interps, VMEM-resident tables); 4-D space-time planes fold to
        # the static encode at the render's fixed frame time. MEASURED
        # default (RESULTS r5 bench rows): the fused kplanes encode is
        # ~2% slower than XLA at refine-all (2.35 vs 2.31 s/frame, r5
        # re-baseline) and only ahead with ERT+cull, EXCEPT on contracted
        # scenes where the in-kernel contraction+hybrid chain wins 1.59x
        # (307k vs 192k rays/s) — kplanes uses the kernel only under
        # contraction
        enc_ok = (self.pos_encoder == "freq"
                  or (self.pos_encoder == "kplanes"
                      and self.scene_contraction))
        return bool(self.cfg.use_pallas and pallas_available()
                    and fusable(self.model_cfg)
                    and enc_ok
                    and data_only
                    # (scene contraction IS fused — an elementwise warp on
                    # marching points inside the kernel since round 4 —
                    # and so is IPE since round 5: frustum moments + exact
                    # contraction pushforward + per-band attenuation all
                    # run in-kernel, ops/fused_raymarch.py)
                    # the kernel's matmuls are bf16 by design; an explicit
                    # --compute_dtype float32 must get true-fp32 XLA eval
                    and str(self.cfg.compute_dtype) == "bfloat16")

    # ------------------------------------------------------------------
    # checkpoints
    # ------------------------------------------------------------------

    @property
    def ckpt_dir(self) -> Path:
        # always the MAIN out_dir: process 0 writes, everyone restores from
        # the same path (multi-host restore assumes shared storage)
        d = self._main_out_dir / "checkpoints"
        d.mkdir(parents=True, exist_ok=True)
        return d

    @property
    def _orbax(self):
        if getattr(self, "_orbax_mgr", None) is None and \
                self.cfg.ckpt_backend == "orbax":
            self._orbax_mgr = ckpt.OrbaxCheckpointer(
                self.ckpt_dir, max_to_keep=self.cfg.ckpt_max_to_keep or None)
        return getattr(self, "_orbax_mgr", None)

    def save_checkpoint(self, step: int, tag: str | None = None,
                        include_optim: bool = True):
        """Write a checkpoint; → the written file path (None off-main or
        under the orbax backend, which manages its own directory)."""
        if not self.is_main:
            return None                   # process 0 owns checkpoint writes
        # the occupancy grid is EMA state (not a pure function of params):
        # checkpoint it so resume is bit-exact, not a zero-grid approximation
        extra = ({"occ_grid": np.asarray(self.occ_grid)}
                 if self.occ_grid is not None else None)
        if self.cfg.ckpt_backend == "orbax" and tag is None:
            self._orbax.save(step, self.state, asdict(self.cfg), extra=extra)
            return None
        # tagged saves (pause/interrupt) always use the single-file format
        return ckpt.save_checkpoint(self.ckpt_dir, step, self.state,
                                    asdict(self.cfg), tag=tag,
                                    include_optim=include_optim, extra=extra)

    def find_latest_checkpoint(self):
        if self.cfg.ckpt_backend == "orbax":
            # Signal checkpoints (pause/interrupt) are always written as
            # tagged .npz files even under the orbax backend — resume from
            # whichever source has the higher step so an interrupt save is
            # never silently discarded.
            ob_step = self._orbax.latest_step()
            npz = ckpt.find_latest_checkpoint(self.ckpt_dir, self._main_out_dir)
            npz_step = ckpt.step_of_path(npz) if npz is not None else -1
            if npz is not None and (ob_step is None or npz_step > int(ob_step)):
                return npz
            return ob_step
        return ckpt.find_latest_checkpoint(self.ckpt_dir, self._main_out_dir)

    def _apply_tp_shardings(self) -> None:
        """On a data x model mesh (--mesh_model), lay the params onto their
        tensor-parallel shardings: Megatron col/row trunk pairs + grid
        tables feature-sharded (parallel/mesh.py:nerf_param_shardings).
        No-op on data-only meshes. Called after init AND after checkpoint
        restore (restored arrays land replicated)."""
        if self.plan.mesh is None or "model" not in self.plan.mesh.axis_names:
            return
        from nerf_sandbox_tpu.parallel.mesh import apply_param_shardings
        self.state = self.state._replace(
            params_c=apply_param_shardings(self.plan, self.state.params_c),
            params_f=apply_param_shardings(self.plan, self.state.params_f))

    def load_checkpoint(self, path, load_optim: bool = True) -> int:
        self._occ_grid_restored = False
        if self.cfg.ckpt_backend == "orbax" and isinstance(path, int):
            tmpl = ({"occ_grid": np.asarray(self.occ_grid)}
                    if self.occ_grid is not None else None)
            self.state, step, extras = self._orbax.restore(
                path, self.state, load_optim=load_optim, extra_template=tmpl)
            self._restore_occ_grid(extras)
            self._apply_tp_shardings()
            return step
        self.state, step, _ = ckpt.load_checkpoint(
            path, self.state, load_optim=load_optim,
            allow_partial=bool(getattr(self.cfg, "allow_partial_restore", False)))
        self._restore_occ_grid(ckpt.load_extras(path))
        self._apply_tp_shardings()
        return step

    def _restore_occ_grid(self, extras: dict) -> None:
        """Adopt a checkpointed occupancy grid (bit-exact resume); grid-less
        checkpoints fall back to the zero-grid rebuild in train()."""
        g = extras.get("occ_grid") if extras else None
        if g is None or self.occ_grid is None:
            return
        if g.shape != self.occ_grid.shape:
            print(f"[occ] checkpointed grid shape {g.shape} != configured "
                  f"{self.occ_grid.shape} (--occ_res changed?) — rebuilding")
            return
        from nerf_sandbox_tpu.parallel import dist
        self.occ_grid = dist.replicate_to_mesh(self.plan, jnp.asarray(g)) \
            if dist.is_multiprocess() else jnp.asarray(g)
        self._occ_grid_restored = True
        print("[occ] occupancy grid restored from checkpoint")

    def load_latest_checkpoint(self, load_optim: bool = True) -> int:
        target = self.find_latest_checkpoint()
        if target is None:
            print("[CKPT] no checkpoint found to resume from")
            return 0
        return self.load_checkpoint(target, load_optim=load_optim)

    # ------------------------------------------------------------------
    # training loop
    # ------------------------------------------------------------------

    def _pool_eval_grid(self, params):
        """Eval-only kplanes plane pooling (--eval_kp_pool): resample the
        pos_grid tables to the eval resolution. A handful of R'xR matmuls —
        negligible next to the render it precedes."""
        if (self._kp_pool <= 1 or not isinstance(params, dict)
                or "pos_grid" not in params):
            return params
        from nerf_sandbox_tpu.models.kplanes import resize_kplanes_params
        pooled, _ = resize_kplanes_params(params["pos_grid"], self.enc_cfg,
                                          self.eval_enc_cfg.plane_res)
        out = dict(params)
        out["pos_grid"] = pooled
        return out

    def _eval_app_vec(self):
        """The fixed appearance code eval renders fold into the color head
        (--eval_appearance: table mean | zero | a train frame's code)."""
        table = self.state.params_f["app_emb"]
        mode = str(getattr(self.cfg, "eval_appearance", "mean")).strip().lower()
        if mode == "zero":
            return jnp.zeros((self.app_dim,), jnp.float32)
        if mode == "mean":
            return jnp.mean(table, axis=0)
        return table[int(mode)]

    def _fold_app(self, params):
        """Fold the eval appearance code into a radiance model's color head
        (no-op when codes are off or the slot isn't a radiance model)."""
        if not self.app_dim or not isinstance(params, dict) \
                or "color_fc" not in params:
            return params
        from nerf_sandbox_tpu.models.mlp import fold_appearance
        folded, _ = fold_appearance(params, self.model_cfg,
                                    self._eval_app_vec())
        return folded

    def export_mesh_obj(self, step: int):
        """--export_mesh: sigma lattice sweep → marching-tetrahedra OBJ
        (render/mesh.py; beyond-reference — the torch reference has no
        geometry export). Runs on the main process only."""
        if not self.is_main:
            return None
        from nerf_sandbox_tpu.render.mesh import (export_obj,
                                                  marching_tetrahedra,
                                                  query_density_grid)
        cfg = self.cfg
        s = float(getattr(cfg, "mesh_aabb", 0.0) or 0.0)
        if s > 0:
            lo, hi = (-s, -s, -s), (s, s, s)
        elif self.use_ndc:
            # the encoder sees NDC marching coords; the mesh lives there too
            lo, hi = (-1.0, -1.0, 0.0), (1.0, 1.0, 1.0)
        elif self.scene_contraction:
            # foreground sits inside the unit ball (trainer warns
            # otherwise); +-2 world covers it plus the near background
            lo, hi = (-2.0, -2.0, -2.0), (2.0, 2.0, 2.0)
        elif self.enc_cfg is not None:
            a = float(self.enc_cfg.aabb_scale)
            lo, hi = (-a, -a, -a), (a, a, a)
        elif self.occ_cfg is not None:
            lo, hi = self.occ_cfg.lo, self.occ_cfg.hi
        else:
            lo, hi = (-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)
        res = int(cfg.mesh_res)
        ct = (None if str(cfg.compute_dtype) == "float32"
              else jnp.dtype(cfg.compute_dtype))

        # dynamic scenes: --mesh_time_sweep K exports the time-lapse
        # geometry (K OBJs over t = linspace(0,1,K)); otherwise one OBJ
        # at --mesh_time (static scenes: no time at all)
        sweep = int(getattr(cfg, "mesh_time_sweep", 0) or 0)
        if self.dynamic and sweep > 1:
            times = [float(t) for t in np.linspace(0.0, 1.0, sweep)]
        elif self.dynamic:
            times = [float(getattr(cfg, "mesh_time", 0.0) or 0.0)]
        else:
            times = [None]

        params_eval = self._fold_app(dict(self.state.params_f))
        path = None
        for ti, t in enumerate(times):
            grid = query_density_grid(
                params_eval,
                self.eval_hyper.model, self.pos_bands, self.dir_bands,
                res=res, lo=lo, hi=hi,
                sigma_activation=cfg.sigma_activation,
                pos_include_input=cfg.pos_include_input,
                dir_include_input=cfg.dir_include_input,
                pos_encoder=self.pos_encoder, enc_cfg=self.enc_cfg,
                compute_dtype=ct, scene_contraction=self.scene_contraction,
                dir_encoder=self.dir_encoder, sh_degree=self.sh_degree,
                time=t)
            verts, faces = marching_tetrahedra(grid, float(cfg.mesh_thr),
                                               lo, hi)
            tag = f"_t{ti:03d}" if len(times) > 1 else ""
            path = self.out_dir / "mesh" / f"mesh_step_{step:07d}{tag}.obj"
            export_obj(path, verts, faces)
            tstr = "" if t is None else f", t={t:.3f}"
            print(f"[MESH] wrote {path} ({len(verts)} verts, {len(faces)} "
                  f"faces; res {res}, thr {cfg.mesh_thr}, box {lo}..{hi}"
                  f"{tstr})")
        return path

    def eval_params(self):
        """(coarse-slot, fine params) for eval renders — the coarse slot
        carries the occupancy grid in occupancy mode. Appearance codes are
        folded here so every eval path runs the app-free architecture."""
        pf = self._fold_app(self._pool_eval_grid(self.state.params_f))
        if self.sampling_mode == "occupancy":
            return self.occ_grid, pf
        pc = self._pool_eval_grid(self.state.params_c)
        if self.sampling_mode != "proposal":
            # the proposal MLP is density-only and app-free by construction
            pc = self._fold_app(pc)
        return pc, pf

    def _maybe_update_occupancy(self, step: int) -> None:
        if self.occ_update is None:
            return
        if step % self.occ_cfg.update_every == 0:
            key = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 13), step)
            self.occ_grid = self.occ_update(self.occ_grid, self.state.params_f,
                                            key)

    def _rebuild_occupancy(self, step: int) -> None:
        """Reconstruct the (non-checkpointed) grid from the current model:
        updating a ZERO grid yields max(0·decay, sigma) = the density field
        the EMA converges to. Used on resume and --render_only; starting
        from the all-ones init instead would read as fully occupied for
        ~log(alpha_thr)/log(decay) update cycles."""
        if self.occ_update is None:
            return
        key = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 13), step)
        self.occ_grid = self.occ_update(jnp.zeros_like(self.occ_grid),
                                        self.state.params_f, key)

    # ------------------------------------------------------------------
    # validation (sync body + async worker)
    # ------------------------------------------------------------------

    def _check_val_divergence(self, step: int, psnr: float) -> None:
        """Bad-basin detector for importance placement feeding a fast grid
        (RESULTS.md 'Distortion-loss collapse' §5): proposal/hierarchical
        resampling + a fast grid encoder can lock onto a wrong-depth
        sample cluster on unlucky seeds — measured 16.3-16.9 dB stalls
        across EVERY seed-43 config vs 21+ and climbing for healthy runs
        of the same recipe. A loud named warning with the measured fixes;
        training continues (the collapse is a local optimum, not a crash).
        """
        hist = self._val_psnr_history
        hist.append((int(step), float(psnr)))
        if self._divergence_warned or len(hist) < 2:
            return
        fast_grid = (self.pos_encoder in ("kplanes", "hashgrid")
                     and float(getattr(self.cfg, "lr_grid", 0) or 0) >= 5e-3)
        if not fast_grid or self.sampling_mode == "occupancy":
            return
        (s0, p0), (s1, p1) = hist[0], hist[-1]
        if p1 < 18.0 and (p1 - p0) < 0.5 and s1 > s0:
            self._divergence_warned = True
            print(
                f"[WARN] val PSNR stalled at {p1:.2f} dB (step {s0}->{s1}: "
                f"{p0:.2f}->{p1:.2f}) under {self.sampling_mode} sampling "
                f"with a fast {self.pos_encoder} grid (lr_grid "
                f"{float(self.cfg.lr_grid):g}): the resample feedback loop "
                "can collapse into a wrong-depth cluster on unlucky seeds "
                "(RESULTS.md 'Distortion-loss collapse' §5). Measured "
                "fixes: --sampling occupancy (seed-robust, ties this "
                "family's quality); a different --seed; "
                "--prop_explore_floor 1.0 as a placement-independent "
                "diagnostic.")

    def _run_validation(self, step: int, pc, pf) -> None:
        """Render + write validation artifacts for ``step`` using the given
        params (snapshot — JAX arrays are immutable, so capturing the
        references at the scheduled step IS an exact snapshot)."""
        t0 = time.perf_counter()
        _, metrics = self.valr.render_indices_at_step(
            step, self.val_frame_indices, pc, pf, use_mask="auto",
            res_scale=float(self.cfg.val_res_scale),
            log_to_tb=bool(self.cfg.use_tb))
        if metrics.get("psnr_mean") is not None:
            ssim = metrics.get("ssim_mean")
            ssim_txt = f" SSIM={ssim:.4f}" if ssim is not None else ""
            print(f"[VAL] step={step} mean PSNR={metrics['psnr_mean']:.2f} dB"
                  f"{ssim_txt} over {len(self.val_frame_indices)} frame(s)")
            self._check_val_divergence(step, float(metrics["psnr_mean"]))
        if self.cfg.progress_video_during_training:
            start, count = self.valr.render_progress_block(pc, pf)
            if count > 0:
                print(f"[PROGRESS] wrote progress frames [{start}..{start+count-1}]")
        dur = time.perf_counter() - t0
        with self._val_stats_lock:
            self._val_event_durations.append(dur)
            recent = self._val_event_durations[-10:]
            self._val_avg_seconds = sum(recent) / max(1, len(recent))

    def _val_worker(self) -> None:
        while True:
            job = self._val_queue.get()
            try:
                if job is None:
                    return
                step, pc, pf = job
                try:
                    self._run_validation(step, pc, pf)
                except BaseException as e:   # noqa: BLE001 — a dead worker
                    # would deadlock the bounded-queue producer, so nothing
                    # may escape (SystemExit from a library included)
                    self._val_failures.append(step)
                    print(f"[VAL] async validation at step {step} failed: {e}")
            finally:
                self._val_queue.task_done()

    def _start_async_val(self) -> None:
        import queue
        import threading
        self._val_failures: list[int] = []
        self._val_queue = queue.Queue(maxsize=2)
        self._val_thread = threading.Thread(
            target=self._val_worker, name="async-val", daemon=True)
        self._val_thread.start()

    def _dispatch_validation(self, step: int) -> None:
        pc, pf = self.eval_params()
        if (getattr(self, "_val_thread", None) is not None
                and not self._val_thread.is_alive()):
            # the worker died (it shields BaseException, but belt and
            # braces: a blocked put on a dead consumer would hang forever)
            print("[VAL] WARNING: async validation worker died — "
                  "falling back to synchronous validation")
            self._val_thread = None
        if getattr(self, "_val_thread", None) is not None:
            # The train step donates the state buffers, so holding the raw
            # references is NOT a snapshot — the next dispatch deletes them.
            # jnp.copy is a device-side copy dispatched asynchronously
            # (~5 MB for the vanilla params; never blocks the host).
            pc, pf = jax.tree.map(jnp.copy, (pc, pf))
            # Blocks only when 2 events are already in flight (backpressure
            # = the reference's blocking behavior, never unbounded memory).
            self._val_queue.put((step, pc, pf))
        else:
            self._run_validation(step, pc, pf)

    def _stop_async_val(self, discard_pending: bool = False) -> None:
        if getattr(self, "_val_thread", None) is None:
            return
        if discard_pending:
            import queue
            try:
                while True:
                    self._val_queue.get_nowait()
                    self._val_queue.task_done()
            except queue.Empty:
                pass
        self._val_queue.put(None)
        self._val_thread.join()
        self._val_thread = None
        if self._val_failures:
            print(f"[VAL] WARNING: {len(self._val_failures)} async validation "
                  f"event(s) FAILED (steps {self._val_failures}); their "
                  "artifacts are missing.")

    def train(self) -> None:
        cfg = self.cfg
        interrupted = False

        # ---- resume (trainer.py:670-696) ----
        resume_from = Path(cfg.resume_path) if cfg.resume_path else None
        if resume_from is None and cfg.auto_resume and int(self.state.step) == 0:
            resume_from = self.find_latest_checkpoint()   # Path | int (orbax)
        if resume_from is not None and (
                isinstance(resume_from, int) or Path(resume_from).exists()):
            self.load_checkpoint(resume_from, load_optim=not cfg.resume_no_optim)
            print(f"[CKPT] Resuming from step {int(self.state.step) + 1} "
                  f"({resume_from})")
        # state.step also reflects a checkpoint loaded earlier via --resume.
        start_step = int(self.state.step) + 1
        if start_step > 1 and cfg.progress_video_during_training:
            self.valr.resume_to_step(start_step - 1)

        self._val_next_idx = fast_forward(self.val_steps, start_step)
        nxt = (self.val_steps[self._val_next_idx]
               if self._val_next_idx < len(self.val_steps) else None)
        if nxt is not None:
            print(f"[VAL] next validation at step {nxt} "
                  f"({self._val_next_idx + 1}/{len(self.val_steps)})")

        max_steps = int(cfg.max_steps)
        log_every = max(1, int(cfg.log_every))
        ckpt_every = max(1, int(cfg.ckpt_every))

        eta_window = deque(maxlen=20)
        last_log_time = time.time()
        last_log_step = start_step - 1
        metrics = None
        pending_skips = []   # device scalars; summed (host) only at log time

        profiling = False
        if cfg.profile_dir:
            jax.profiler.start_trace(cfg.profile_dir)
            profiling = True

        # Multi-step fusion: advance `scan` optimizer steps per dispatch when
        # no schedule boundary (validation / checkpoint / diagnostic / end)
        # falls inside the chunk.  Boundaries remain step-exact.
        scan = max(1, int(getattr(cfg, "scan_steps", 1) or 1))
        chunk_step = None
        # the default-config warm-up gate (chunking from step 101, keeping
        # the first-100-step ray-norm diagnostics per-step) applies only
        # when scan_steps was LEFT AT its default; an explicit --scan_steps
        # engages from step 1 so short runs honor the flag (ADVICE r4)
        from nerf_sandbox_tpu.config import Config as _Cfg
        scan_from = 1 if scan != int(_Cfg.scan_steps) else 101
        if scan > 1:
            chunk_step = build_train_step(
                self.hyper, self.spec, self.tx, self.pos_bands, self.dir_bands,
                plan=self.plan, base_seed=cfg.seed, scan_steps=scan)
            if scan_from > 1:
                print(f"[cfg] scan_steps={scan} (default): step chunking "
                      f"engages at step {scan_from} (first-100-step "
                      "diagnostics stay per-step; pass --scan_steps "
                      "explicitly to chunk from step 1)")

        occupancy = self.sampling_mode == "occupancy"
        if occupancy and start_step > 1 and \
                not getattr(self, "_occ_grid_restored", False):
            # grid-less (old-format) checkpoint: approximate the EMA grid by
            # one update of a zero grid from the restored model
            self._rebuild_occupancy(start_step - 1)

        self._val_thread = None
        if cfg.async_val and self.val_steps:
            self._start_async_val()
            print("[VAL] async validation worker started "
                  "(--async_val false to disable)")

        def _next_boundary(s: int) -> int:
            """Smallest step >= s at which a host action must run."""
            nxt_val = (self.val_steps[self._val_next_idx]
                       if self._val_next_idx < len(self.val_steps)
                       else max_steps)
            nxt_ckpt = ((s - 1) // ckpt_every + 1) * ckpt_every
            nxt = min(nxt_val, nxt_ckpt, max_steps)
            if self.sampling_mode == "hierarchical":
                # the 500-step fine-sampling diagnostic only runs (and only
                # makes sense) with a coarse NeRF — don't break scan chunks
                # on it in occupancy/proposal modes
                nxt = min(nxt, ((s - 1) // 500 + 1) * 500)
            if occupancy:
                every = self.occ_cfg.update_every
                nxt = min(nxt, ((s - 1) // every + 1) * every)
            return nxt

        step = start_step - 1
        try:
            while step < max_steps:
                occ_args = (self.occ_grid,) if occupancy else ()
                # default scan: chunking engages after step 100 so the
                # first-100-step ray-norm diagnostics (reference parity)
                # stay per-step and sub-100-step smoke runs behave
                # identically to scan=1; explicit --scan_steps chunks from
                # step 1 (scan_from above)
                if chunk_step is not None and step >= scan_from - 1 and \
                        step + scan <= _next_boundary(step + 1):
                    self.state, metrics = chunk_step(self.state, self.scene_arrays,
                                                     *occ_args)
                    step += scan
                else:
                    self.state, metrics = self.train_step(self.state,
                                                          self.scene_arrays,
                                                          *occ_args)
                    step += 1
                if occupancy and step % self.occ_cfg.update_every == 0:
                    self._maybe_update_occupancy(step)
                if "skipped" in metrics:
                    pending_skips.append(metrics["skipped"])

                # first-100-step ray-norm sanity prints (reference
                # trainer.py:886-893; every 10th step — the batch is
                # regenerated from the same fold_in(seed, step) stream the
                # jitted step used, so the numbers are exact)
                if step <= 100 and step % 10 in (0, 1):
                    self._print_ray_norms(step)

                # signals (checked every dispatch; cheap — host-only flags)
                if self.signals.sigusr1:
                    try:
                        self.save_checkpoint(step, tag=f"pause_step_{step}")
                    except Exception as e:
                        print(f"[PAUSE] checkpoint save failed: {e}")
                    self.signals.sigusr1 = False
                if self.signals.sigint:
                    try:
                        self.save_checkpoint(step, tag=f"interrupt_step_{step}")
                    except Exception as e:
                        print(f"[INT] checkpoint save failed: {e}")
                    print("[INT] Exiting training loop.")
                    interrupted = True
                    break

                # logging (pulls device values only here)
                if step - last_log_step >= log_every or step == max_steps:
                    loss_val = float(metrics["loss"])
                    psnr_val = float(metrics["psnr"])
                    n_skipped = int(np.sum(jax.device_get(pending_skips))) \
                        if pending_skips else 0
                    pending_skips.clear()
                    if n_skipped > 0:
                        print(f"[WARN] {n_skipped} non-finite loss step(s) since "
                              f"the last log (ending at step {step}); those "
                              "updates were skipped.")
                    now = time.time()
                    steps_delta = max(1, step - last_log_step)
                    sec_per_step = (now - last_log_time) / steps_delta
                    eta_window.append(sec_per_step)
                    avg = sum(eta_window) / len(eta_window)
                    eta_train = (max_steps - step) * avg
                    rem_val = len(self.val_steps) - self._val_next_idx
                    with self._val_stats_lock:
                        val_avg = self._val_avg_seconds
                    eta_total = eta_train + rem_val * val_avg
                    lr_now = self.lr_info["lr"]
                    try:
                        from nerf_sandbox_tpu.train.step import make_lr_schedule
                        sched = make_lr_schedule(cfg.lr_scheduler, cfg.lr,
                                                 self.lr_info["params"])
                        lr_now = float(sched(step - 1)) if callable(sched) else sched
                    except Exception:
                        pass
                    print(f"[{step:7d}] loss={loss_val:.6f} psnr={psnr_val:.2f} "
                          f"lr={lr_now:.2e} ({sec_per_step:.3f}s/step avg {avg:.3f}s) "
                          f"rays/s={self.spec.rays_per_batch / max(avg, 1e-9):,.0f} "
                          f"ETA(train) {_fmt_eta(eta_train)} | ETA(total) {_fmt_eta(eta_total)}")
                    self.tb_logger.add_scalar("train/loss", loss_val, step)
                    self.tb_logger.add_scalar("train/psnr", psnr_val, step)
                    self.tb_logger.add_scalar("train/lr", float(lr_now), step)
                    self.monitor.log_to_tb(self.tb_logger, step)
                    last_log_time, last_log_step = now, step
                    pressure = self.monitor.guard_state(step)
                    if (pressure and self.monitor.enable_throttle
                            and self.valr.eval_chunk > 1024):
                        # --thermal_throttle: under HBM pressure shrink the
                        # validation render tile (reference gpu_thermal.py:69-90
                        # raises micro-chunks when hot; this is the TPU analogue)
                        self.valr.eval_chunk //= 2
                        print(f"[DEVICE] validation eval tile -> "
                              f"{self.valr.eval_chunk}")
                    elif (pressure is False
                          and self.valr.eval_chunk < self._eval_chunk_init):
                        # pressure cleared: step the tile back up toward its
                        # configured size (a one-way ratchet would let one
                        # transient spike slow every later validation)
                        self.valr.eval_chunk = min(self._eval_chunk_init,
                                                   self.valr.eval_chunk * 2)
                        print(f"[DEVICE] HBM pressure cleared; validation "
                              f"eval tile -> {self.valr.eval_chunk}")

                # hierarchical-sampling health check (trainer.py:937-979 cadence)
                if step % 500 == 0 and self.sampling_mode == "hierarchical":
                    # only the hierarchical mode has a coarse NeRF whose
                    # weights this diagnostic interprets
                    self._fine_sampling_diagnostic(step)

                # scheduled validation
                if (self._val_next_idx < len(self.val_steps)
                        and step == self.val_steps[self._val_next_idx]):
                    self._dispatch_validation(step)
                    self._val_next_idx += 1
                    if self._val_next_idx < len(self.val_steps):
                        print(f"[VAL] next validation at step "
                              f"{self.val_steps[self._val_next_idx]} "
                              f"({self._val_next_idx + 1}/{len(self.val_steps)})")
                    else:
                        print("[VAL] schedule complete.")

                if step % ckpt_every == 0:
                    self.save_checkpoint(step)

            # End-of-training checkpoint when max_steps isn't a ckpt_every
            # multiple (divergence from the reference, which leaves such runs
            # checkpoint-less and unable to --render_only / resume).
            if step % ckpt_every != 0 and not interrupted:
                self.save_checkpoint(step)

        except BaseException:
            # Stop the async-val worker before propagating: a daemon
            # thread killed mid-PNG/TB write leaves truncated artifacts
            # with no failure report (review finding r2).
            self._stop_async_val(discard_pending=True)
            raise
        if profiling:
            jax.profiler.stop_trace()

        if interrupted:
            # SIGINT semantics: quick exit — abandon queued validations,
            # finish the one in flight (reference skips exports too).
            self._stop_async_val(discard_pending=True)
            if getattr(self, "_orbax_mgr", None) is not None:
                self._orbax_mgr.mgr.wait_until_finished()
            self.tb_logger.close()
            return

        # drain pending validations before the video exports read the PNGs
        self._stop_async_val()

        # ---- post-training exports (trainer.py:842-872) ----
        try:
            self.valr.export_val_videos_for_indices(
                self.val_frame_indices, fps=int(cfg.path_fps))
        except Exception as e:
            print(f"[VAL-VIDEO] export failed: {e}")

        if cfg.render_path_after:
            try:
                print("[CAMERA PATH] Rendering final camera-path video...")
                self.valr.render_camera_path_video(
                    *self.eval_params(),
                    video_name="camera_path", overwrite=True)
            except Exception as e:
                print(f"[CAMERA PATH] Failed: {e}")

        if cfg.progress_video_during_training:
            try:
                self.valr.export_progress_video(video_name="training_progress")
            except Exception as e:
                print(f"[PROGRESS] Video assembly failed: {e}")

        if getattr(cfg, "export_mesh", False):
            try:
                self.export_mesh_obj(step)
            except Exception as e:
                print(f"[MESH] export failed: {e}")

        if getattr(self, "_orbax_mgr", None) is not None:
            self._orbax_mgr.mgr.wait_until_finished()
        self.tb_logger.close()
