"""Procedural multi-view test scene: ray-traced lambertian spheres.

Generates a Blender-format dataset (transforms_train/val.json + PNGs) with
REAL 3-D parallax so end-to-end training quality (novel-view PSNR, depth)
can be validated without external datasets.  Used by the quality-run
verification and available for manual experiments:

    python tests/make_sphere_scene.py /tmp/spheres --views 20 --size 128
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

SPHERES = [  # (center, radius, albedo)
    (np.array([0.0, 0.0, 0.0]), 0.7, np.array([0.9, 0.25, 0.2])),
    (np.array([0.9, 0.2, 0.3]), 0.35, np.array([0.2, 0.5, 0.9])),
    (np.array([-0.7, -0.3, 0.6]), 0.3, np.array([0.3, 0.85, 0.3])),
    (np.array([0.1, 0.8, -0.4]), 0.25, np.array([0.95, 0.8, 0.2])),
]
LIGHT_DIR = np.array([0.4, 0.8, 0.45]) / np.linalg.norm([0.4, 0.8, 0.45])


def ray_trace(o: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Trace rays (N,3),(N,3) → RGBA float32 (N,4); white-lit lambertian."""
    n = o.shape[0]
    best_t = np.full(n, np.inf)
    rgb = np.zeros((n, 3), np.float32)
    hit = np.zeros(n, bool)
    for c, r, albedo in SPHERES:
        oc = o - c
        b = np.sum(oc * d, -1)
        disc = b * b - (np.sum(oc * oc, -1) - r * r)
        ok = disc > 0
        t = np.where(ok, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
        ok &= (t > 1e-3) & (t < best_t)
        if not ok.any():
            continue
        p = o[ok] + t[ok, None] * d[ok]
        nrm = (p - c) / r
        shade = 0.25 + 0.75 * np.maximum(nrm @ LIGHT_DIR, 0.0)
        rgb[ok] = albedo[None] * shade[:, None]
        best_t[ok] = t[ok]
        hit[ok] = True
    alpha = hit.astype(np.float32)
    return np.concatenate([rgb, alpha[:, None]], -1).astype(np.float32)


def render_view(c2w: np.ndarray, H: int, W: int, focal: float) -> np.ndarray:
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    x = (xs + 0.5 - W / 2) / focal
    y = (ys + 0.5 - H / 2) / focal
    dirs = np.stack([x, -y, -np.ones_like(x)], -1).reshape(-1, 3)
    d = dirs @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d.shape)
    return ray_trace(o, d).reshape(H, W, 4)


def look_at_pose(theta: float, phi: float, radius: float) -> np.ndarray:
    eye = radius * np.array([np.cos(phi) * np.sin(theta),
                             np.sin(phi),
                             np.cos(phi) * np.cos(theta)])
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, -fwd
    c2w[:3, 3] = eye
    return c2w


def make_scene(root, views: int = 20, size: int = 128, radius: float = 4.0):
    import imageio.v2 as imageio
    root = Path(root)
    camera_angle_x = 0.6911
    focal = 0.5 * size / np.tan(0.5 * camera_angle_x)
    rng = np.random.RandomState(0)

    for split, n, offs in [("train", views, 0.0), ("val", 2, 0.123)]:
        (root / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for i in range(n):
            theta = 2 * np.pi * (i / n + offs)
            phi = np.deg2rad(20 + 15 * np.sin(3.1 * i + offs))
            c2w = look_at_pose(theta, phi, radius)
            img = render_view(c2w, size, size, focal)
            imageio.imwrite(root / split / f"r_{i}.png",
                            (img * 255 + 0.5).astype(np.uint8))
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        (root / f"transforms_{split}.json").write_text(
            json.dumps({"camera_angle_x": camera_angle_x, "frames": frames}))
    return root


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args()
    make_scene(args.root, args.views, args.size)
    print(f"wrote sphere scene to {args.root}")
