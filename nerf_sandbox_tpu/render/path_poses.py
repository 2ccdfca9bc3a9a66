"""Camera-path pose generation for progress / final videos (host-side numpy).

Parity target: ``nerf_sandbox/source/utils/path_pose_generator.py:6-298``:

* ``blender``: the official ``pose_spherical`` — translate(radius) →
  rot_phi → rot_theta → axis-fix matrix; thetas linspace over 360°·rots
  starting at theta_start (endpoint excluded)
* ``llff_spiral`` / ``llff_zflat``: re-derived from ``poses_bounds.npy``
  (axis fix, sc-scale so near≈1, recenter to average pose), focal from a
  depth mix dt=0.75, spiral radii = 90th percentile of |centers|, poses
  look at the -focal·ẑ focus point; zflat zeroes the z radius and uses one
  rotation
* resolution scaling of (H, W, K) by ``res_scale``.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from nerf_sandbox_tpu.data.llff_loader import average_pose, _unit


def scaled_hwk(scene, res_scale: float) -> Tuple[int, int, np.ndarray]:
    """(H, W, K) of the scene's first frame, scaled by res_scale."""
    fr = scene.frames[0]
    H0, W0 = fr.H, fr.W
    K = np.asarray(fr.K, np.float32).copy()
    s = float(res_scale)
    if s != 1.0:
        H = max(1, int(round(H0 * s)))
        W = max(1, int(round(W0 * s)))
        K[:2] *= s
        return H, W, K
    return H0, W0, K


def median_camera_radius(scene) -> float:
    centers = np.stack([np.asarray(f.c2w, np.float32)[:3, 3] for f in scene.frames])
    r = float(np.median(np.linalg.norm(centers, axis=1)))
    return r if np.isfinite(r) and r > 1e-6 else 4.0


# ---------------- Blender spherical path ----------------

_AXIS_FIX = np.array([[-1, 0, 0, 0],
                      [0, 0, 1, 0],
                      [0, 1, 0, 0],
                      [0, 0, 0, 1]], dtype=np.float32)


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Official blender spherical pose (path_pose_generator.py:103-130)."""
    phi, th = np.deg2rad(phi_deg), np.deg2rad(theta_deg)
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius
    rphi = np.eye(4, dtype=np.float32)
    rphi[1, 1] = rphi[2, 2] = np.cos(phi)
    rphi[1, 2], rphi[2, 1] = -np.sin(phi), np.sin(phi)
    rth = np.eye(4, dtype=np.float32)
    rth[0, 0] = rth[2, 2] = np.cos(th)
    rth[0, 2], rth[2, 0] = -np.sin(th), np.sin(th)
    return (_AXIS_FIX @ rth @ rphi @ trans).astype(np.float32)


def blender_path(n_frames: int, *, phi_deg: float = -30.0, radius: float = 4.0,
                 theta_start_deg: float = -180.0, rots: float = 1.0) -> List[np.ndarray]:
    thetas = np.linspace(theta_start_deg, theta_start_deg + 360.0 * rots,
                         num=int(n_frames), endpoint=False)
    return [pose_spherical(float(t), phi_deg, radius) for t in thetas]


# ---------------- LLFF spiral path ----------------

def _look_at(z: np.ndarray, up: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(3,4) view matrix with back-axis z (path_pose_generator.py:165-170)."""
    vec2 = _unit(z)
    vec0 = _unit(np.cross(up, vec2))
    vec1 = _unit(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], axis=1).astype(np.float32)


def llff_spiral_path(data_root, n_frames: int, *, rots: float = 2.0,
                     zrate: float = 0.5, zflat: bool = False,
                     bd_factor: float = 0.75) -> List[np.ndarray]:
    """Official LLFF spiral derived from poses_bounds.npy
    (path_pose_generator.py:216-290)."""
    pb_path = Path(data_root) / "poses_bounds.npy"
    if not pb_path.exists():
        raise FileNotFoundError(f"poses_bounds.npy not found at: {pb_path}")
    pb = np.load(str(pb_path)).astype(np.float32)
    poses = pb[:, :-2].reshape(-1, 3, 5)
    bds = pb[:, -2:]

    # axis fix [down,right,back] → [right,up,back]
    poses = np.concatenate([poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], 2)

    sc = 1.0 / (float(bds.min()) * float(bd_factor))
    poses[:, :3, 3] *= sc
    bds = bds * sc

    # recenter to average pose (sum-axes variant, like the official spiral)
    avg = average_pose(poses[:, :, :3], poses[:, :, 3], sum_axes=True)
    w2c = np.linalg.inv(avg)
    homo = np.tile(np.eye(4, dtype=np.float32), (poses.shape[0], 1, 1))
    homo[:, :3, :4] = poses[:, :, :4]
    poses[:, :, :4] = (w2c[None] @ homo)[:, :3, :4]

    up = _unit(poses[:, :3, 1].sum(0))
    close_depth, inf_depth = float(bds.min() * 0.9), float(bds.max() * 5.0)
    dt = 0.75
    focal = 1.0 / (((1.0 - dt) / close_depth) + (dt / inf_depth))

    rads = np.percentile(np.abs(poses[:, :3, 3]), 90, axis=0).astype(np.float32)
    base = _look_at(_unit(poses[:, :3, 2].sum(0)), poses[:, :3, 1].sum(0),
                    poses[:, :3, 3].mean(0))                        # (3,4)

    n_rots = float(rots)
    if zflat:
        zloc = -close_depth * 0.1
        base = base.copy()
        base[:, 3] = base[:, 3] + zloc * base[:, 2]
        rads[2] = 0.0
        n_rots = 1.0

    rads4 = np.append(rads, 1.0).astype(np.float32)
    out: List[np.ndarray] = []
    for theta in np.linspace(0.0, 2.0 * np.pi * n_rots, int(n_frames) + 1,
                             dtype=np.float32)[:-1]:
        offset = np.array([np.cos(theta), -np.sin(theta),
                           -np.sin(theta * zrate), 1.0], np.float32) * rads4
        c = base @ offset                                           # (3,)
        focus = base @ np.array([0.0, 0.0, -focal, 1.0], np.float32)
        vm = _look_at(c - focus, up, c)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :4] = vm
        out.append(c2w)
    return out


# ---------------- unified API ----------------

def generate_path_poses(
    scene_val, n_frames: int, *, path_type: str, res_scale: float = 1.0,
    data_root=None,
    bl_phi_deg: float = -30.0, bl_radius: Optional[float] = None,
    bl_theta_start_deg: float = -180.0, bl_rots: float = 1.0,
    rots: float = 2.0, zrate: float = 0.5, path_zflat: bool = False,
    bd_factor: float = 0.75,
) -> Tuple[List[np.ndarray], int, int, np.ndarray]:
    """→ (poses: list of 4x4, H, W, K), mirroring PathPoseGenerator.generate."""
    H, W, K = scaled_hwk(scene_val, res_scale)
    ptype = str(path_type).lower().strip()

    if ptype == "blender":
        radius = bl_radius if bl_radius is not None else median_camera_radius(scene_val)
        poses = blender_path(n_frames, phi_deg=float(bl_phi_deg),
                             radius=float(radius),
                             theta_start_deg=float(bl_theta_start_deg),
                             rots=float(bl_rots))
        return poses, H, W, K

    if ptype in ("llff_spiral", "llff_zflat"):
        if data_root is None:
            raise ValueError("LLFF paths require data_root (poses_bounds.npy)")
        poses = llff_spiral_path(data_root, n_frames, rots=float(rots),
                                 zrate=float(zrate),
                                 zflat=bool(path_zflat or ptype == "llff_zflat"),
                                 bd_factor=float(bd_factor))
        return poses, H, W, K

    raise ValueError(f"Unsupported path_type '{path_type}' "
                     "(use 'blender' | 'llff_spiral' | 'llff_zflat')")
