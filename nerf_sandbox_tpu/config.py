"""Configuration + CLI flag surface.

Parity target: ``nerf_sandbox/source/scripts/train_nerf.py:50-375`` — the
same ~70 flags with the same names/defaults, the dataset-aware ``--vanilla``
profile (train_nerf.py:243-308), and the per-dataset camera-path defaults
(train_nerf.py:317-375).  Mutation policy matches the reference: ALL default
mutation happens here in the config layer, never in the Trainer; precedence
is explicit flags < vanilla profile (overwrites) < path defaults
(fill-if-missing).

Structural difference: the config is a typed ``dataclass`` (the stale
reference tests wanted one too — SURVEY.md §4) instead of a SimpleNamespace,
and TPU-runtime knobs (mesh axes, bf16) replace the CUDA/AMP/thermal ones
while keeping the legacy flag names accepted.
"""

from __future__ import annotations

import argparse
import ast
import json
from dataclasses import dataclass, field, fields
from typing import Any, Dict, List, Optional


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    s = str(v).lower()
    if s in {"true", "1", "yes", "y", "on"}:
        return True
    if s in {"false", "0", "no", "n", "off"}:
        return False
    raise argparse.ArgumentTypeError(f"Invalid boolean: {v}")


def parse_scheduler_params(s) -> Dict[str, Any]:
    """Accept a JSON object or a Python literal dict (train_nerf.py:201-213)."""
    if isinstance(s, dict):
        return s
    s = (s or "").strip() if isinstance(s, str) else ""
    if not s:
        return {}
    try:
        return json.loads(s)
    except Exception:
        try:
            out = ast.literal_eval(s)
            return out if isinstance(out, dict) else {}
        except Exception:
            return {}


@dataclass
class Config:
    # Dataset + IO
    data_kind: str = "auto"            # auto | blender | llff
    data_root: str = ""
    out_dir: str = ""
    downscale: int = 1
    centering: Optional[str] = None    # auto | none (default depends on kind)
    scene_scale: float = 1.0
    cache_images_on_device: bool = False   # kept for CLI parity; TPU always caches

    # LLFF specifics
    bd_factor: float = 0.75
    use_llff_holdout: bool = True
    holdout_every: int = 0
    holdout_offset: int = 0

    # Ray / space conventions
    camera_convention: Optional[str] = None
    use_ndc: bool = False
    ndc_near_plane_world: Optional[float] = None
    white_bkgd: bool = False

    # Model + rendering core
    pos_num_freqs: int = 10
    dir_num_freqs: int = 4
    pos_include_input: bool = True
    dir_include_input: bool = True
    n_layers: int = 8
    hidden_dim: int = 256
    skip_pos: int = 4
    sigma_activation: str = "relu"
    initial_acc_opacity: float = 0.0

    # Sampling
    nc: int = 64
    nf: int = 128
    det_fine: bool = False
    rays_per_batch: int = 2048
    raw_noise_std: float = 1.0
    precrop_iters: int = 0
    precrop_frac: float = 1.0
    sample_from_single_frame: bool = False

    # Micro-batching / chunking
    micro_chunks: int = 0
    train_micro_chunks: Optional[int] = None
    eval_micro_chunks: Optional[int] = None
    train_chunk: int = 0

    # Ranges
    near_world: Optional[float] = None
    far_world: Optional[float] = None
    llff_near_percentile: float = 5.0
    llff_far_percentile: float = 95.0

    # Optim / schedule
    lr: float = 5e-4
    # >0: separate Adam lr for grid-encoder tables (kplanes/hashgrid
    # pos_grid subtrees; Instant-NGP practice — tables want ~1e-2 while
    # the MLP wants 5e-4). 0 = shared lr (reference semantics).
    lr_grid: float = 0.0
    # >0: decoupled per-step weight decay on grid tables, toward the
    # family's neutral element (kplanes 1.0 — multiplicative features;
    # hashgrid 0.0). 0 = off.
    grid_weight_decay: float = 0.0
    # >0: total-variation smoothness prior on the kplanes plane/line
    # tables (k-planes §3.2). 0 = off.
    kp_tv_weight: float = 0.0
    lr_scheduler: str = "cosine"
    lr_scheduler_params: Any = field(
        default_factory=lambda: {"eta_min": 5e-6, "T_max": 200_000})
    grad_clip_norm: float = 0.0

    # Runtime
    max_steps: int = 200_000
    ckpt_every: int = 10_000
    log_every: int = 100
    device: Optional[str] = None       # kept for CLI parity; JAX picks devices
    use_tb: bool = False
    tb_logdir: Optional[str] = None
    tb_image_max_side: int = 512
    seed: int = 42
    infinite_last_bin: bool = False

    # Thermal flags (reference: laptop-GPU guard, gpu_thermal.py:29-90).
    # On TPU there is nothing to throttle — accepted, logged, no-ops.
    thermal_throttle: bool = False
    gpu_temp_threshold: int = 85
    gpu_temp_check_every: int = 20
    gpu_cooldown_seconds: int = 45
    thermal_throttle_max_micro: int = 16
    thermal_throttle_sleep: float = 5.0

    # Validation rendering
    val_every: Optional[int] = None
    val_indices: Optional[str] = None
    val_split: str = "auto"
    num_val_steps: Optional[int] = None
    eval_chunk: int = 16384
    val_res_scale: float = 1.0
    progress_video_during_training: bool = False
    val_schedule: str = "power"
    val_power: float = 2.0

    # Profiles
    vanilla: bool = False

    # Render-only / resume
    render_only: bool = False
    auto_resume: bool = False
    resume_path: Optional[str] = None
    resume: Optional[str] = None
    resume_no_optim: bool = False
    # Load a checkpoint whose param keys don't fully match the current
    # architecture (missing leaves keep fresh-init values, with a warning).
    allow_partial_restore: bool = False

    # Path rendering
    render_path_after: bool = False
    progress_frames: int = 120
    path_fps: int = 30
    path_res_scale: float = 1.0
    path_type: Optional[str] = None
    # Blender path knobs
    bl_phi_deg: Optional[float] = None
    bl_rots: Optional[float] = None
    bl_theta_start_deg: Optional[float] = None
    bl_radius: Optional[float] = None
    # LLFF path knobs
    rots: Optional[float] = None
    zrate: Optional[float] = None
    path_zflat: Optional[bool] = None
    rads_scale: Optional[float] = None

    # TPU-native knobs (new)
    # fuse N optimizer steps per dispatch (lax.scan; engages after step
    # 100 so the first-100-step diagnostics stay per-step — measured
    # 2.55x wall on the axon tunnel, boundary-exact: RESULTS "scan_steps")
    scan_steps: int = 16
    ckpt_backend: str = "npz"          # npz (single-file) | orbax (async)
    ckpt_max_to_keep: int = 0          # orbax retention; 0 = keep all
    mesh_devices: int = 0              # 0 = all visible devices
    # >1: hierarchical 2-D (dcn_data x ici_data) data mesh for multi-slice
    # jobs — grad all-reduce decomposes ICI-first (parallel/mesh.py).
    mesh_slices: int = 0
    # >1: 2-D data x model mesh; the trunk gets Megatron col/row TP and
    # factorized-grid tables (kplanes) shard their feature axis — per-device
    # param HBM and the 2QR²F encode FLOPs both divide by this
    # (parallel/mesh.py:nerf_param_shardings). Model axis should be the
    # ICI-inner one. Mutually exclusive with --mesh_slices.
    mesh_model: int = 0
    # Shard the training image bank over the mesh's data axes (frame dim):
    # per-device HBM /= n_devices, per-host disk decode /= n_processes
    # (loaders skip non-owned frames); pixel fetch = masked local gather +
    # one (B, C) psum. "auto" = on under multi-process, off otherwise.
    shard_scene: str = "auto"
    compute_dtype: str = "bfloat16"    # MLP matmul dtype on TPU
    # Fused Pallas ray-march (encode+MLP+composite in one VMEM kernel) for
    # eval renders: 1.34x the XLA path on v5e (RESULTS.md). Default ON;
    # applies on TPU + frequency encoder + fusable arch, else falls back
    # to XLA. --use_pallas false forces the XLA path everywhere.
    use_pallas: bool = True
    # SCORED renders (train-time validation PSNR, nerf-tpu-eval, one-off
    # PSNR frames) use the exact XLA path even when the fused kernel is on:
    # the kernel's bf16 encode+MLP chain costs measured PSNR vs the fp32
    # XLA oracle (0.26 dB plain freq / 0.81 contracted kplanes-hybrid /
    # 1.69 IPE — RESULTS.md "Scored-eval path"), which contaminates
    # quality comparisons. Throughput renders (progress blocks,
    # camera-path videos, --render_only) keep the fused kernel. false =
    # score through whatever path use_pallas selects (pre-round-5
    # behavior, and the right choice when benchmarking the kernel itself).
    val_exact: bool = True
    # Eval fine-ray culling: refine only this fraction of rays per tile
    # (ranked by coarse opacity); the rest keep the coarse composite.
    # In occupancy mode: evaluate the model only on this fraction of rays
    # (ranked by occupied probe-bin count); the rest composite directly to
    # background — the grid already proved those rays cross nothing.
    # 1.0 = reference semantics (refine every ray).
    eval_fine_frac: float = 1.0
    # Early ray termination in the fused eval kernel: a 128-ray tile skips
    # its remaining sample chunks once every ray's transmittance < eps
    # (per-channel error bound eps; standard NeRF eval practice, e.g.
    # NerfAcc/Instant-NGP). Pallas path only. 0.0 = march every sample
    # (exact reference semantics).
    eval_ert_eps: float = 1e-4
    # Async validation: run scheduled validation renders + PNG/TB writes on
    # a worker thread against a params snapshot so the train loop keeps
    # dispatching steps; artifacts are bit-identical to the sync path
    # (tests/test_async_val.py). Bounded queue (2 events) degrades to the
    # reference's blocking behavior (trainer.py:790-831) under backpressure.
    # Default OFF: measured on this 1-core/1-chip container a validation
    # event is ~1.6 s of which ~90% is DEVICE render time, so there is
    # nothing to overlap on one chip and GIL contention makes the 3k-step
    # 20-event run 5-7% SLOWER (RESULTS.md). Turn on for multi-core hosts
    # where PNG/TB host work is the validation bottleneck.
    async_val: bool = False
    profile_dir: Optional[str] = None  # jax.profiler trace output
    # Multi-process (multi-host) execution: one JAX process per host over a
    # global mesh (parallel/dist.py). On TPU pods the runtime auto-detects
    # coordinator/process ids — leave the three knobs unset; they exist for
    # CPU/GPU clusters and the 2-process CPU tests.
    multihost: bool = False
    coordinator_address: Optional[str] = None
    num_processes: int = 0
    process_id: int = -1

    # Sampling strategy (new — NerfAcc-style acceleration, docs/ROADMAP.md)
    sampling: str = "hierarchical"     # hierarchical | occupancy | proposal
    occ_res: int = 64
    occ_update_every: int = 16
    occ_decay: float = 0.95
    occ_probes: int = 64
    occ_aabb_scale: float = 1.5        # world box half-width (non-NDC)
    # None = auto: 0.02 in world space, 0.5 under NDC (far-plane bootstrap
    # — RESULTS.md). An explicit value is always respected.
    occ_explore_frac: Optional[float] = None
    # >0: blend probe weights toward uniform by max(0, 1 - step/anneal) —
    # step 0 samples exactly stratified, pure grid-driven by this step.
    # Bootstraps density everywhere before the grid concentrates the
    # budget (the NDC far-plane fix, generalizing the static floor).
    occ_explore_anneal: int = 0
    # proposal mode (mip-NeRF 360-style): a small density MLP places the
    # main model's samples; trained with the interlevel bound loss.
    prop_layers: int = 2
    prop_hidden: int = 64
    # 0 -> use --nc. Scene-dependent (measured @3k on the synthetic
    # scenes): blender-style prefers 128 (+0.5 dB over 64), forward-facing
    # LLFF prefers 64 (128 costs 1.5 dB) — RESULTS.md.
    prop_samples: int = 0
    interlevel_weight: float = 1.0
    # mip-NeRF 360 proposal-resample anneal: resample weights w^b with
    # b = Schlick-bias(step/anneal_steps, slope) ramping 0->1, so the
    # untrained proposal resamples near-uniformly. 0 = off.
    prop_anneal_steps: int = 0
    prop_anneal_slope: float = 10.0
    # persistent uniform floor on the proposal resample PDF,
    # (1-f)·ŵ + f/M — occupancy's explore_frac analogue. Keeps a fraction
    # of the main model's samples covering the full range forever, so grid
    # encoders (kplanes) keep receiving gradient outside the proposal's
    # peaks. 0 = off (pure mip-NeRF 360 behavior).
    prop_explore_floor: float = 0.0
    # mip-NeRF 360 distortion loss (L_dist §4) on the fine/main weights:
    # compacts each ray's histogram; THE floater/fog fix for unbounded
    # scenes (measured on tests/make_360_scene.py — RESULTS.md). Applies
    # in every sampling mode. 0 = off (reference semantics).
    distortion_weight: float = 0.0
    # >0: ramp the distortion weight linearly 0->full over this many
    # steps. Full-strength distortion at init + importance placement +
    # a fast grid encoder collapses to a wrong-depth optimum (measured,
    # seed-dependent; RESULTS.md "Distortion-loss collapse"). 0 = off.
    distortion_anneal_steps: int = 0
    # mip-NeRF 360 scene contraction of encoder inputs: maps R^3 into the
    # radius-2 ball (unbounded/360 scenes). Ignored under --use_ndc.
    scene_contraction: bool = False
    # Disparity-linear coarse/proposal sample spacing (bmild lindisp knob;
    # the reference hard-codes False). Requires near > 0.
    lindisp: bool = False
    # mip-NeRF integrated positional encoding (Barron et al. 2021): each
    # sample is a conical-frustum Gaussian over its interval and the freq
    # encoding becomes its expectation — scale-aware / anti-aliased.
    # freq encoder + non-NDC scenes only (the trainer gates + notes).
    ipe: bool = False
    # NeRF-W per-frame appearance embeddings (Martin-Brualla et al. 2021,
    # beyond-reference): a learned (n_train_frames, appearance_dim) code
    # table whose per-ray row feeds the color head — absorbs per-frame
    # photometric variation (exposure / white balance / lighting) so the
    # shared geometry+radiance stays clean. 0 = off.
    appearance_dim: int = 0
    # Eval-time code for frames with no learned embedding: "mean" of the
    # learned table, "zero" (the canonical near-zero init), or an integer
    # train-frame index whose code to borrow.
    eval_appearance: str = "mean"
    # BARF/NeRF---style learned camera refinement (beyond-reference): a
    # per-train-frame se3 delta table trained through ray generation by
    # the photometric loss. Recovers from noisy/imprecise input poses;
    # validation keeps the dataset's val poses unmodified.
    pose_opt: bool = False
    pose_lr: float = 1e-3
    # BARF coarse-to-fine positional-encoding anneal: freq bands fade in
    # low-to-high over this many steps. The standard companion to
    # --pose_opt (pose gradients under a full L=10 encoding are basin-
    # less); also usable alone as a curriculum. 0 = off.
    barf_anneal_steps: int = 0
    # Mesh export (beyond-reference): after training (and in
    # --render_only), sample sigma on a mesh_res^3 lattice and write the
    # sigma > mesh_thr isosurface as OBJ via marching tetrahedra
    # (render/mesh.py). mesh_aabb 0 = auto box (NDC box under --use_ndc,
    # +-2 under contraction, else the encoder/occupancy aabb_scale).
    export_mesh: bool = False
    mesh_res: int = 256
    mesh_thr: float = 25.0
    mesh_aabb: float = 0.0

    # Encoder family (new — BASELINE config #5 stretch)
    # positional = reference parity; hashgrid = Instant-NGP tables
    # (functional, HBM-gather-bound on TPU — measured in RESULTS.md);
    # kplanes = factorized planes+lines, the TPU-fast family (pure MXU).
    encoder: str = "positional"        # positional | hashgrid | kplanes
    # View-direction encoder: "freq" = reference gamma (L=dir_num_freqs,
    # 27 dims); "sh" = real spherical harmonics of degree sh_degree
    # (Instant-NGP practice; sh_degree^2 dims — smaller and cheaper).
    dir_enc: str = "freq"
    sh_degree: int = 4
    hash_levels: int = 16
    hash_features: int = 2
    hash_log2_size: int = 19
    hash_base_res: int = 16
    hash_max_res: int = 512
    hash_aabb_scale: float = 1.5
    kp_plane_res: str = "64,128"       # comma-separated plane resolutions
    kp_plane_features: int = 8
    kp_line_res: int = 512
    kp_line_features: int = 16
    kp_aabb_scale: float = 1.5
    # >0: DYNAMIC scenes (k-planes 4-D): per scale, three space-time
    # planes (xt/yt/zt) + a CP time line join the feature product; frames
    # must carry D-NeRF-style normalized "time" in transforms_*.json.
    # Time planes init at the multiplicative neutral 1.0 (static until
    # the data trains motion in). 0 = static 3-D planes.
    kp_time_res: int = 0
    # Iso-time for --export_mesh on a dynamic scene (normalized [0,1]).
    mesh_time: float = 0.0
    # >1: --export_mesh writes K OBJs swept over t = linspace(0,1,K)
    # (time-lapse geometry for D-NeRF data); 0/1 = single --mesh_time OBJ.
    mesh_time_sweep: int = 0
    # Dynamic occupancy: the grid is the UNION of density probed at this
    # many times in [0,1] (static scenes ignore it). More probes = tighter
    # union for fast motion at linearly more update cost.
    occ_time_probes: int = 5
    # >0: concat a parameter-free L-band freq encoding of the (contracted)
    # box coords to the plane features — the unbounded-scene hybrid
    # (RESULTS.md "Unbounded-360" #5: the enclosing background shell
    # contaminates every axis-aligned plane projection; freq channels
    # give the MLP an uncontaminated positional signal). 0 = off.
    # DEFAULT 6 since round 5 — measured neutral-to-positive on bounded
    # scenes (24.64 vs 24.16 tex; 27.48 vs 27.26 LLFF) and +11 dB on
    # contracted ones (RESULTS.md), at +39 encoder dims.
    kp_hybrid_freqs: int = 6
    # Eval-only plane downsample factor (1 = off): bilinear-resample the
    # plane tables before full-image renders; 4x encode-FLOP cut per
    # factor-2 (the eval tax is the 2QR^2F one-hot contraction).
    eval_kp_pool: int = 1


def build_argparser() -> argparse.ArgumentParser:
    """The reference CLI surface (train_nerf.py:59-194) + TPU knobs."""
    p = argparse.ArgumentParser("NeRF training / rendering entry script (TPU)")
    d = Config()

    g = p.add_argument_group("dataset/io")
    g.add_argument("--data_kind", choices=["auto", "blender", "llff"], default=d.data_kind)
    g.add_argument("--data_root", type=str, required=True)
    g.add_argument("--out_dir", type=str, required=True)
    g.add_argument("--downscale", type=int, default=d.downscale)
    g.add_argument("--centering", choices=["auto", "none"], default=None)
    g.add_argument("--scene_scale", type=float, default=d.scene_scale)
    g.add_argument("--cache_images_on_device", type=str2bool, default=d.cache_images_on_device)

    g = p.add_argument_group("llff")
    g.add_argument("--bd_factor", type=float, default=d.bd_factor)
    g.add_argument("--use_llff_holdout", type=str2bool, default=d.use_llff_holdout)
    g.add_argument("--holdout_every", type=int, default=d.holdout_every)
    g.add_argument("--holdout_offset", type=int, default=d.holdout_offset)

    g = p.add_argument_group("rays")
    g.add_argument("--camera_convention", type=str, default=None)
    g.add_argument("--use_ndc", action="store_true")
    g.add_argument("--ndc_near_plane_world", type=float, default=None)
    g.add_argument("--white_bkgd", type=str2bool, default=d.white_bkgd)

    g = p.add_argument_group("model")
    g.add_argument("--pos_num_freqs", type=int, default=d.pos_num_freqs)
    g.add_argument("--dir_num_freqs", type=int, default=d.dir_num_freqs)
    g.add_argument("--pos_include_input", type=str2bool, default=d.pos_include_input)
    g.add_argument("--dir_include_input", type=str2bool, default=d.dir_include_input)
    g.add_argument("--n_layers", type=int, default=d.n_layers)
    g.add_argument("--hidden_dim", type=int, default=d.hidden_dim)
    g.add_argument("--skip_pos", type=int, default=d.skip_pos)
    g.add_argument("--sigma_activation", choices=["relu", "softplus"], default=d.sigma_activation)
    g.add_argument("--initial_acc_opacity", type=float, default=d.initial_acc_opacity)

    g = p.add_argument_group("sampling")
    g.add_argument("--nc", type=int, default=d.nc, help="Coarse samples per ray")
    g.add_argument("--nf", type=int, default=d.nf, help="Fine samples per ray")
    g.add_argument("--det_fine", action="store_true")
    g.add_argument("--rays_per_batch", type=int, default=d.rays_per_batch)
    g.add_argument("--raw_noise_std", type=float, default=d.raw_noise_std)
    g.add_argument("--precrop_iters", type=int, default=d.precrop_iters)
    g.add_argument("--precrop_frac", type=float, default=d.precrop_frac)
    g.add_argument("--sample_from_single_frame", action="store_true")

    g = p.add_argument_group("chunking")
    g.add_argument("--micro_chunks", type=int, default=d.micro_chunks)
    g.add_argument("--train_micro_chunks", type=int, default=None)
    g.add_argument("--eval_micro_chunks", type=int, default=None)
    g.add_argument("--train_chunk", type=int, default=d.train_chunk)

    g = p.add_argument_group("ranges")
    g.add_argument("--near_world", type=float, default=None)
    g.add_argument("--far_world", type=float, default=None)

    g = p.add_argument_group("optim")
    g.add_argument("--lr", type=float, default=d.lr)
    g.add_argument("--lr_grid", type=float, default=d.lr_grid,
                   help=">0: separate Adam lr for kplanes/hashgrid tables")
    g.add_argument("--lr_scheduler", choices=["none", "cosine"], default=d.lr_scheduler)
    g.add_argument("--lr_scheduler_params", type=str,
                   default=d.lr_scheduler_params,
                   help="JSON or Python dict, e.g. '{\"T_max\":200000,\"eta_min\":5e-6}'")
    g.add_argument("--grad_clip_norm", type=float, default=d.grad_clip_norm)
    g.add_argument("--grid_weight_decay", type=float,
                   default=d.grid_weight_decay,
                   help="decoupled weight decay on grid tables toward the "
                        "family-neutral value (kplanes 1.0, hashgrid 0.0)")
    g.add_argument("--kp_tv_weight", type=float, default=d.kp_tv_weight,
                   help="total-variation smoothness prior on the kplanes "
                        "tables (k-planes practice: try 1e-4..1e-2)")

    g = p.add_argument_group("runtime")
    g.add_argument("--max_steps", type=int, default=d.max_steps)
    g.add_argument("--ckpt_every", type=int, default=d.ckpt_every)
    g.add_argument("--log_every", type=int, default=d.log_every)
    g.add_argument("--device", type=str, default=None)
    g.add_argument("--use_tb", action="store_true")
    g.add_argument("--tb_logdir", type=str, default=None)
    g.add_argument("--seed", type=int, default=d.seed)
    g.add_argument("--infinite_last_bin", type=str2bool, default=d.infinite_last_bin)

    g = p.add_argument_group("thermal (accepted for parity; no-op on TPU)")
    g.add_argument("--thermal_throttle", action="store_true")
    g.add_argument("--gpu_temp_threshold", type=int, default=d.gpu_temp_threshold)
    g.add_argument("--gpu_temp_check_every", type=int, default=d.gpu_temp_check_every)
    g.add_argument("--gpu_cooldown_seconds", type=int, default=d.gpu_cooldown_seconds)
    g.add_argument("--thermal_throttle_max_micro", type=int, default=d.thermal_throttle_max_micro)
    g.add_argument("--thermal_throttle_sleep", type=float, default=d.thermal_throttle_sleep)

    g = p.add_argument_group("validation")
    g.add_argument("--val_every", type=int, default=None)
    g.add_argument("--val_indices", type=str, default=None)
    g.add_argument("--val_split", choices=("auto", "train", "val", "test"),
                   default=d.val_split,
                   help="which split validation/eval renders against; "
                        "'auto' = val, falling back to test then train "
                        "(the reference's fallback, trainer.py:219-226)")
    g.add_argument("--num_val_steps", type=int, default=None)
    g.add_argument("--eval_chunk", type=int, default=d.eval_chunk)
    g.add_argument("--val_res_scale", type=float, default=d.val_res_scale)
    g.add_argument("--progress_video_during_training", action="store_true")
    g.add_argument("--val_schedule", type=str, default=d.val_schedule)
    g.add_argument("--val_power", type=float, default=d.val_power)

    g = p.add_argument_group("profiles")
    g.add_argument("--vanilla", action="store_true")

    g = p.add_argument_group("resume/render")
    g.add_argument("--render_only", action="store_true")
    g.add_argument("--auto_resume", action="store_true")
    g.add_argument("--resume_path", type=str, default=None)
    g.add_argument("--resume", type=str, default=None,
                   help="'latest' or a checkpoint path; overrides --auto_resume/--resume_path")
    g.add_argument("--resume_no_optim", action="store_true")
    g.add_argument("--allow_partial_restore", action="store_true",
                   help="Permit loading a checkpoint whose param keys don't "
                        "fully match the current architecture")

    g = p.add_argument_group("path rendering")
    g.add_argument("--render_path_after", action="store_true")
    g.add_argument("--progress_frames", type=int, default=d.progress_frames)
    g.add_argument("--path_fps", type=int, default=d.path_fps)
    g.add_argument("--path_res_scale", type=float, default=d.path_res_scale)
    g.add_argument("--path_type", type=str, default=None)
    g.add_argument("--bl_phi_deg", type=float, default=None)
    g.add_argument("--bl_rots", type=float, default=None)
    g.add_argument("--bl_theta_start_deg", type=float, default=None)
    g.add_argument("--bl_radius", type=float, default=None)
    g.add_argument("--rots", type=float, default=None)
    g.add_argument("--zrate", type=float, default=None)
    g.add_argument("--path_zflat", type=str2bool, default=None)
    g.add_argument("--rads_scale", type=float, default=None)

    g = p.add_argument_group("sampling strategy")
    g.add_argument("--sampling",
                   choices=["hierarchical", "occupancy", "proposal"],
                   default=d.sampling,
                   help="occupancy: EMA density grid replaces the coarse "
                        "NeRF pass (one model eval per step); proposal: "
                        "small density MLP + mip-NeRF-360 interlevel loss")
    g.add_argument("--occ_res", type=int, default=d.occ_res)
    g.add_argument("--occ_update_every", type=int, default=d.occ_update_every)
    g.add_argument("--occ_decay", type=float, default=d.occ_decay)
    g.add_argument("--occ_probes", type=int, default=d.occ_probes)
    g.add_argument("--occ_aabb_scale", type=float, default=d.occ_aabb_scale)
    g.add_argument("--occ_explore_frac", type=float, default=d.occ_explore_frac)
    g.add_argument("--occ_explore_anneal", type=int,
                   default=d.occ_explore_anneal,
                   help="anneal probe weights from stratified to "
                        "grid-driven over this many steps (0 = off)")
    g.add_argument("--prop_layers", type=int, default=d.prop_layers)
    g.add_argument("--prop_hidden", type=int, default=d.prop_hidden)
    g.add_argument("--prop_samples", type=int, default=d.prop_samples,
                   help="proposal samples/ray (0 -> --nc)")
    g.add_argument("--interlevel_weight", type=float,
                   default=d.interlevel_weight)
    g.add_argument("--prop_anneal_steps", type=int,
                   default=d.prop_anneal_steps,
                   help="anneal proposal resampling toward the learned "
                        "histogram over this many steps (0 = off)")
    g.add_argument("--prop_anneal_slope", type=float,
                   default=d.prop_anneal_slope)
    g.add_argument("--prop_explore_floor", type=float,
                   default=d.prop_explore_floor,
                   help="persistent uniform floor on the proposal resample "
                        "PDF (occupancy explore_frac analogue; keeps grid "
                        "encoders fed outside the proposal's peaks)")
    g.add_argument("--distortion_weight", type=float,
                   default=d.distortion_weight,
                   help="mip-NeRF 360 distortion loss weight on the "
                        "fine/main weights (floater fix for unbounded "
                        "scenes; try 0.01-0.1 — but <=3e-3 or an onset "
                        "ramp with grid encoders under proposal/"
                        "hierarchical sampling)")
    g.add_argument("--distortion_anneal_steps", type=int,
                   default=d.distortion_anneal_steps,
                   help="ramp the distortion weight 0->full over this "
                        "many steps (collapse fix for fast grid encoders "
                        "under importance placement)")
    g.add_argument("--scene_contraction", type=str2bool,
                   default=d.scene_contraction,
                   help="mip-NeRF 360 contraction of encoder inputs "
                        "(unbounded scenes; ignored under --use_ndc)")
    g.add_argument("--lindisp", type=str2bool, default=d.lindisp,
                   help="disparity-linear coarse/proposal sample spacing")
    g.add_argument("--ipe", type=str2bool, default=d.ipe,
                   help="mip-NeRF integrated positional encoding (anti-"
                        "aliased freq encoder; non-NDC scenes)")
    g.add_argument("--appearance_dim", type=int, default=d.appearance_dim,
                   help="NeRF-W per-frame appearance code width (learned "
                        "(n_train_frames, dim) table feeding the color "
                        "head; absorbs per-frame exposure/lighting). 0=off")
    g.add_argument("--eval_appearance", type=str, default=d.eval_appearance,
                   help="code for eval renders: 'mean' | 'zero' | integer "
                        "train-frame index")
    g.add_argument("--pose_opt", type=str2bool, default=d.pose_opt,
                   help="BARF-style camera refinement: learn per-train-"
                        "frame se3 pose deltas through the photometric loss")
    g.add_argument("--pose_lr", type=float, default=d.pose_lr,
                   help="Adam lr for the pose-delta table (--pose_opt)")
    g.add_argument("--barf_anneal_steps", type=int, default=d.barf_anneal_steps,
                   help="BARF coarse-to-fine anneal: fade freq bands in "
                        "low-to-high over this many steps (companion to "
                        "--pose_opt)")
    g.add_argument("--export_mesh", type=str2bool, default=d.export_mesh,
                   help="write a marching-tetrahedra OBJ of the sigma > "
                        "mesh_thr isosurface after training / --render_only")
    g.add_argument("--mesh_res", type=int, default=d.mesh_res,
                   help="mesh lattice resolution (res^3 sigma queries)")
    g.add_argument("--mesh_thr", type=float, default=d.mesh_thr,
                   help="sigma iso-level for the mesh surface")
    g.add_argument("--mesh_aabb", type=float, default=d.mesh_aabb,
                   help="half-extent of the mesh box (0 = auto)")

    g = p.add_argument_group("encoder family")
    g.add_argument("--encoder", choices=["positional", "hashgrid", "kplanes"],
                   default=d.encoder)
    g.add_argument("--dir_enc", choices=["freq", "sh"], default=d.dir_enc,
                   help="view-direction encoder: reference freq gamma or "
                        "real spherical harmonics (sh_degree^2 dims)")
    g.add_argument("--sh_degree", type=int, default=d.sh_degree,
                   help="SH degree for --dir_enc sh (1..4; 4 -> 16 dims)")
    g.add_argument("--hash_levels", type=int, default=d.hash_levels)
    g.add_argument("--hash_features", type=int, default=d.hash_features)
    g.add_argument("--hash_log2_size", type=int, default=d.hash_log2_size)
    g.add_argument("--hash_base_res", type=int, default=d.hash_base_res)
    g.add_argument("--hash_max_res", type=int, default=d.hash_max_res)
    g.add_argument("--hash_aabb_scale", type=float, default=d.hash_aabb_scale)
    g.add_argument("--eval_kp_pool", type=int, default=d.eval_kp_pool,
                   help="kplanes: downsample plane tables by this factor "
                        "for EVAL renders only (the plane contraction is "
                        "2QR^2F FLOPs — pool 2 cuts it 4x; training and "
                        "checkpoints keep full resolution)")
    g.add_argument("--kp_plane_res", type=str, default=d.kp_plane_res,
                   help="kplanes: comma-separated multiscale plane resolutions")
    g.add_argument("--kp_time_res", type=int, default=d.kp_time_res,
                   help="kplanes 4-D time resolution for DYNAMIC scenes "
                        "(D-NeRF-style per-frame 'time' required); 0=static")
    g.add_argument("--mesh_time", type=float, default=d.mesh_time,
                   help="normalized time for --export_mesh on dynamic scenes")
    g.add_argument("--mesh_time_sweep", type=int, default=d.mesh_time_sweep,
                   help="dynamic scenes: export this many --export_mesh "
                        "OBJs swept over t=linspace(0,1,K) (0/1 = single "
                        "--mesh_time export)")
    g.add_argument("--occ_time_probes", type=int, default=d.occ_time_probes,
                   help="dynamic occupancy: number of times in [0,1] whose "
                        "density UNION fills the grid (default 5)")
    g.add_argument("--kp_plane_features", type=int, default=d.kp_plane_features)
    g.add_argument("--kp_line_res", type=int, default=d.kp_line_res)
    g.add_argument("--kp_line_features", type=int, default=d.kp_line_features)
    g.add_argument("--kp_aabb_scale", type=float, default=d.kp_aabb_scale)
    g.add_argument("--kp_hybrid_freqs", type=int, default=d.kp_hybrid_freqs,
                   help="concat an L-band freq encoding to the kplanes "
                        "features (measured default 6: neutral-to-positive "
                        "bounded, +11 dB contracted; 0 = plain planes)")

    g = p.add_argument_group("tpu")
    g.add_argument("--scan_steps", type=int, default=d.scan_steps,
                   help="Fuse N optimizer steps into one device dispatch "
                        "(lax.scan); amortises launch overhead. Engages "
                        "after step 100; schedule boundaries stay "
                        "step-exact. 1 = one dispatch per step")
    g.add_argument("--ckpt_backend", choices=["npz", "orbax"], default=d.ckpt_backend)
    g.add_argument("--ckpt_max_to_keep", type=int, default=d.ckpt_max_to_keep)
    g.add_argument("--mesh_devices", type=int, default=d.mesh_devices)
    g.add_argument("--mesh_slices", type=int, default=d.mesh_slices,
                   help=">1: hierarchical dcn_data x ici_data mesh for "
                        "multi-slice jobs")
    g.add_argument("--mesh_model", type=int, default=d.mesh_model,
                   help=">1: data x model mesh — Megatron trunk TP + "
                        "feature-sharded grid tables (memory-capacity "
                        "scaling for wide/grid models)")
    g.add_argument("--shard_scene", choices=["auto", "true", "false"],
                   default=d.shard_scene,
                   help="Frame-shard the training image bank over the mesh "
                        "(HBM /= devices; multi-process hosts only decode "
                        "their own frames). auto = on when multi-process")
    g.add_argument("--compute_dtype", choices=["bfloat16", "float32"], default=d.compute_dtype)
    g.add_argument("--use_pallas", type=str2bool, default=d.use_pallas)
    g.add_argument("--val_exact", type=str2bool, default=d.val_exact,
                   help="Score validation/eval PSNR through the exact XLA "
                        "path even when the fused kernel renders videos "
                        "(kernel bf16 costs 0.26-1.69 dB of SCORED PSNR, "
                        "RESULTS.md 'Scored-eval path'); false = score "
                        "through the fused kernel (pre-r5 behavior)")
    g.add_argument("--eval_fine_frac", type=float, default=d.eval_fine_frac,
                   help="Refine only this fraction of eval rays (by coarse "
                        "opacity; in occupancy mode: evaluate only this "
                        "fraction, ranked by occupied probe bins, rest = "
                        "background); 1.0 = refine all (reference semantics)")
    g.add_argument("--eval_ert_eps", type=float, default=d.eval_ert_eps,
                   help="Early-ray-termination transmittance threshold in "
                        "the fused eval kernel; 0.0 = march every sample")
    g.add_argument("--async_val", type=str2bool, default=d.async_val,
                   help="Run validation renders/PNG writes on a worker "
                        "thread (params snapshot) so training never stalls")
    g.add_argument("--profile_dir", type=str, default=None)
    g.add_argument("--multihost", action="store_true",
                   help="Multi-process execution: jax.distributed.initialize "
                        "before building the mesh (auto-detected on TPU "
                        "pods; use the coordinator flags elsewhere)")
    g.add_argument("--coordinator_address", type=str, default=None)
    g.add_argument("--num_processes", type=int, default=d.num_processes)
    g.add_argument("--process_id", type=int, default=d.process_id)

    return p


def explicit_flag_names(argv=None) -> set:
    """Names of flags the user actually typed (vs argparse defaults).

    Re-parses with all defaults suppressed, so the resulting namespace only
    contains explicitly provided arguments. Used to warn when ``--vanilla``
    overrides an explicit flag and to flag accepted-but-no-op TPU flags.
    """
    p = build_argparser()
    for a in p._actions:
        a.default = argparse.SUPPRESS
        a.required = False
    ns, _ = p.parse_known_args(argv)
    return set(vars(ns))


# Flags accepted for reference-CLI parity that have no effect on TPU
# (chunking is fused into the jitted step; JAX owns device placement;
# datacenter TPUs need no laptop thermal guard).
NOOP_TPU_FLAGS = (
    "train_chunk", "eval_micro_chunks", "cache_images_on_device", "device",
    "gpu_temp_threshold", "gpu_cooldown_seconds",
    "thermal_throttle_max_micro", "thermal_throttle_sleep",
)


def warn_noop_flags(explicit: set) -> None:
    for name in NOOP_TPU_FLAGS:
        if name in explicit:
            print(f"[cfg] note: --{name} is accepted for CLI parity but is "
                  "a no-op on TPU")
    if "thermal_throttle" in explicit:
        print("[cfg] note: --thermal_throttle maps to the HBM-pressure "
              "monitor on TPU; there is no thermal throttling")


def make_cfg_from_args(args: argparse.Namespace) -> Config:
    """Namespace → Config with normalisation (train_nerf.py:216-240)."""
    known = {f.name for f in fields(Config)}
    cfg = Config(**{k: v for k, v in vars(args).items() if k in known})
    cfg.lr_scheduler_params = parse_scheduler_params(cfg.lr_scheduler_params)
    if cfg.train_micro_chunks is None:
        cfg.train_micro_chunks = int(cfg.micro_chunks or 0)
    if cfg.eval_micro_chunks is None:
        cfg.eval_micro_chunks = int(cfg.micro_chunks or 0)
    if cfg.centering is None and str(cfg.data_kind).lower() != "auto":
        # 'auto' data kind: leave None for the CLI to fill after resolving
        # the real kind (Trainer falls back to "none" if still unset)
        cfg.centering = "auto" if str(cfg.data_kind).lower() == "llff" else "none"
    cfg.train_chunk = int(cfg.train_chunk or 0)
    cfg.out_dir = str(cfg.out_dir)
    return cfg


def apply_vanilla_profile(cfg: Config, explicit: set | None = None) -> Config:
    """Dataset-aware bmild/nerf preset (train_nerf.py:243-308).

    Blender: world rays, white bkgd, mixed-frame, no precrop.
    LLFF: NDC(near=1.0), single-frame + precrop 1000@0.5, white bkgd.
    Both: Lx=10/Ld=4, 8x256 skip@4, nc=64/nf=128, N_rand=1024,
    raw_noise_std=1.0, lr=5e-4, infinite_last_bin=True.

    Like the reference (which hard-forces these in the Trainer,
    trainer.py:277-291/309-341/411-416), the profile overrides explicit
    flags — but warns per overridden flag instead of doing so silently.
    """
    kind = (cfg.data_kind or "").lower()
    forced = dict(
        rays_per_batch=1024, raw_noise_std=1.0, infinite_last_bin=True,
        sigma_activation="relu", nc=64, nf=128, n_layers=8, hidden_dim=256,
        skip_pos=4, pos_num_freqs=10, dir_num_freqs=4, lr=5e-4)
    for name, val in forced.items():
        if explicit and name in explicit and getattr(cfg, name) != val:
            print(f"[cfg] --vanilla forces {name}={val} "
                  f"(overriding --{name} {getattr(cfg, name)})")
        setattr(cfg, name, val)
    cfg.lr_scheduler = cfg.lr_scheduler or "cosine"
    if not cfg.lr_scheduler_params:
        cfg.lr_scheduler_params = {"eta_min": 5e-6, "T_max": cfg.max_steps}
    cfg.initial_acc_opacity = 0.0
    cfg.vanilla = True
    # --vanilla means exact reference eval semantics: disable the fused
    # kernel's early ray termination (its error is bounded <eps/channel but
    # 0.0 is the documented reference marching). An explicit
    # --eval_ert_eps opts back into the fast path.
    if not (explicit and "eval_ert_eps" in explicit):
        cfg.eval_ert_eps = 0.0

    if kind in {"blender", "synthetic"}:
        cfg.use_ndc = False
        cfg.white_bkgd = True
        cfg.camera_convention = cfg.camera_convention or "opengl"
        cfg.sample_from_single_frame = False
        cfg.precrop_iters = 0
        cfg.precrop_frac = 1.0
    elif kind == "llff":
        cfg.use_ndc = True
        if cfg.ndc_near_plane_world is None:
            cfg.ndc_near_plane_world = 1.0
        cfg.camera_convention = cfg.camera_convention or "opengl"
        cfg.sample_from_single_frame = True
        if cfg.precrop_iters == 0:
            cfg.precrop_iters = 1000
        if cfg.precrop_frac == 1.0:
            cfg.precrop_frac = 0.5
        cfg.white_bkgd = True
    return cfg


def apply_path_defaults(cfg: Config, data_kind: str) -> Config:
    """Per-dataset camera-path defaults, fill-if-missing (train_nerf.py:317-375)."""
    kind = (data_kind or "").lower()

    def setdefault(name, value):
        if getattr(cfg, name, None) is None:
            setattr(cfg, name, value)

    if kind in ("blender", "synthetic", "nerf_synthetic"):
        setdefault("path_type", "blender")
        setdefault("bl_phi_deg", -30.0)
        setdefault("bl_rots", 1.0)
        setdefault("bl_theta_start_deg", -180.0)
        # bl_radius stays None → auto (median camera radius)
    elif kind in ("llff", "llff_nerf", "llff_data"):
        setdefault("path_type", "llff_spiral")
        setdefault("rots", 2.0)
        setdefault("zrate", 0.5)
        setdefault("path_zflat", False)
        setdefault("rads_scale", 3.0)
    else:
        setdefault("path_type", "llff_spiral")
        setdefault("rots", 2.5)
        setdefault("zrate", 0.75)
        setdefault("path_zflat", False)
        setdefault("rads_scale", 3.0)
    return cfg
