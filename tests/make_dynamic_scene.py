"""Procedural DYNAMIC test scene (D-NeRF format): moving ray-traced spheres.

Each frame carries a normalized ``time`` in transforms_*.json; the scene's
geometry moves with it — the big sphere bobs vertically, the small blue
sphere orbits the origin. Cameras orbit as in make_sphere_scene.py, so a
training run must disentangle camera motion from OBJECT motion (the 4-D
k-planes regime, ``--encoder kplanes --kp_time_res N``).

    python tests/make_dynamic_scene.py /tmp/dyn --views 30 --size 96
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

try:
    from tests.make_sphere_scene import LIGHT_DIR, look_at_pose
except ModuleNotFoundError:   # invoked as a script: python tests/make_...
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from make_sphere_scene import LIGHT_DIR, look_at_pose


def spheres_at(t: float):
    """Scene geometry at normalized time t in [0, 1]."""
    bob = 0.5 * np.sin(2 * np.pi * t)
    ang = 2 * np.pi * t
    return [
        (np.array([0.0, bob * 0.6, 0.0]), 0.7,
         np.array([0.9, 0.25, 0.2])),
        (np.array([1.1 * np.cos(ang), 0.2, 1.1 * np.sin(ang)]), 0.35,
         np.array([0.2, 0.5, 0.9])),
        (np.array([-0.7, -0.3, 0.6]), 0.3, np.array([0.3, 0.85, 0.3])),
    ]


def ray_trace_t(o: np.ndarray, d: np.ndarray, t: float) -> np.ndarray:
    n = o.shape[0]
    best_t = np.full(n, np.inf)
    rgb = np.zeros((n, 3), np.float32)
    hit = np.zeros(n, bool)
    for c, r, albedo in spheres_at(t):
        oc = o - c
        b = np.sum(oc * d, -1)
        disc = b * b - (np.sum(oc * oc, -1) - r * r)
        ok = disc > 0
        tt = np.where(ok, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
        ok &= (tt > 1e-3) & (tt < best_t)
        if not ok.any():
            continue
        p = o[ok] + tt[ok, None] * d[ok]
        nrm = (p - c) / r
        shade = 0.25 + 0.75 * np.maximum(nrm @ LIGHT_DIR, 0.0)
        rgb[ok] = albedo[None] * shade[:, None]
        best_t[ok] = tt[ok]
        hit[ok] = True
    alpha = hit.astype(np.float32)
    return np.concatenate([rgb, alpha[:, None]], -1).astype(np.float32)


def render_view_t(c2w: np.ndarray, H: int, W: int, focal: float,
                  t: float) -> np.ndarray:
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    x = (xs + 0.5 - W / 2) / focal
    y = (ys + 0.5 - H / 2) / focal
    dirs = np.stack([x, -y, -np.ones_like(x)], -1).reshape(-1, 3)
    d = dirs @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d.shape)
    return ray_trace_t(o, d, t).reshape(H, W, 4)


def make_scene(root, views: int = 30, size: int = 96, radius: float = 4.0,
               val_views: int = 3):
    import imageio.v2 as imageio
    root = Path(root)
    camera_angle_x = 0.6911
    focal = 0.5 * size / np.tan(0.5 * camera_angle_x)

    for split, n, offs in [("train", views, 0.0), ("val", val_views, 0.31)]:
        (root / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for i in range(n):
            t = i / max(1, n - 1)
            # val frames sample intermediate times from different views
            theta = 2 * np.pi * (i / n + offs)
            phi = np.deg2rad(20 + 15 * np.sin(3.1 * i + offs))
            c2w = look_at_pose(theta, phi, radius)
            img = render_view_t(c2w, size, size, focal,
                                t if split == "train" else
                                min(1.0, t + 0.05))
            imageio.imwrite(root / split / f"r_{i}.png",
                            (img * 255 + 0.5).astype(np.uint8))
            frames.append({"file_path": f"./{split}/r_{i}",
                           "time": t if split == "train"
                           else min(1.0, t + 0.05),
                           "transform_matrix": c2w.tolist()})
        (root / f"transforms_{split}.json").write_text(
            json.dumps({"camera_angle_x": camera_angle_x, "frames": frames}))
    return root


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--views", type=int, default=30)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--val_views", type=int, default=3)
    args = ap.parse_args()
    make_scene(args.root, args.views, args.size, val_views=args.val_views)
    print(f"wrote dynamic scene to {args.root}")
