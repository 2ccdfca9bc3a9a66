"""Procedural UNBOUNDED-360 test scene (mip-NeRF 360 geometry class).

The bounded generators (`make_sphere_scene.py`, `make_llff_scene.py`) keep
all content inside the blender [2, 6] depth range; nothing in the repo
exercised `--scene_contraction`'s intended regime — a camera orbiting
foreground content with REAL background depth (hills at r≈12-25, sky shell
at r=80) that no linear near/far sampling window can cover.  This scene is
that regime:

- foreground: the textured checker spheres + a now-INFINITE checkered
  ground plane (checker amplitude fades with distance so the horizon is
  learnable structure rather than aliased noise),
- midground: a ring of large coarse-checkered "hill" spheres at 12-25,
- background: an emissive sky sphere of radius 80 enclosing the cameras
  (rays hit its inside — every ray terminates; no alpha channel).

Cameras orbit at radius 4 exactly like the bounded scene, so the only new
difficulty is depth range: content spans [~2, 84].  Train with
``--near_world 0.5 --far_world 90 --lindisp true --scene_contraction true``
(and without contraction for the ablation RESULTS.md records).

The torch reference has no unbounded-scene machinery at all; this harness
exists to measure the TPU repo's mip-NeRF 360 extensions
(`core/encoding.py` scene_contract, `--prop_anneal_steps`, `--lindisp`).

    python tests/make_360_scene.py /tmp/u360 --views 20 --size 128
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_sphere_scene import (  # noqa: E402
    LIGHT_DIR, PLANE_Y, SPHERES, _plane_albedo, _sphere_albedo, look_at_pose)

SKY_R = 80.0
# (center, radius, base albedo) — coarse-checkered distant hills
HILLS = [
    (np.array([14.0, -2.0, -9.0]), 6.0, np.array([0.45, 0.55, 0.35])),
    (np.array([-18.0, -3.0, 6.0]), 8.0, np.array([0.5, 0.42, 0.3])),
    (np.array([4.0, -4.0, 22.0]), 9.0, np.array([0.35, 0.45, 0.55])),
    (np.array([-9.0, -2.5, -20.0]), 7.0, np.array([0.55, 0.5, 0.38])),
    (np.array([24.0, -3.0, 10.0]), 8.5, np.array([0.4, 0.52, 0.42])),
]


def _hill_albedo(base: np.ndarray, nrm: np.ndarray) -> np.ndarray:
    """Coarse checker (4×2 cells): resolvable at r≈15-25 from the orbit."""
    u = np.arctan2(nrm[:, 2], nrm[:, 0]) / (2 * np.pi) + 0.5
    v = np.arccos(np.clip(nrm[:, 1], -1.0, 1.0)) / np.pi
    checker = (np.floor(u * 4) + np.floor(v * 2)) % 2
    return np.where(checker[:, None] > 0.5, base[None], base[None] * 0.55)


def _sky_rgb(d: np.ndarray) -> np.ndarray:
    """Emissive sky from ray direction: vertical gradient + two soft blobs
    (low-frequency — the background a contracted model should capture)."""
    y = d[:, 1]
    horizon = np.array([0.82, 0.74, 0.62])
    zenith = np.array([0.25, 0.42, 0.78])
    t = np.clip(0.5 * (y + 1.0), 0.0, 1.0)[:, None]
    rgb = horizon[None] * (1 - t) + zenith[None] * t
    az = np.arctan2(d[:, 2], d[:, 0])
    rgb = rgb * (1.0 + 0.12 * np.cos(2 * az) * np.clip(1 - np.abs(y), 0, 1)
                 )[:, None]
    return np.clip(rgb, 0.0, 1.0)


def trace_360(o: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Trace rays (N,3),(N,3) → RGB float32 (N,3). Every ray terminates
    (the sky sphere encloses all cameras); lambertian fore/midground,
    emissive sky."""
    n = o.shape[0]
    best_t = np.full(n, np.inf)
    rgb = np.zeros((n, 3), np.float32)

    for c, r, albedo in SPHERES + HILLS:
        coarse = r > 2.0
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
        alb = (_hill_albedo(albedo, nrm) if coarse
               else _sphere_albedo(albedo, nrm))
        rgb[ok] = alb * shade[:, None]
        best_t[ok] = t[ok]

    # infinite ground plane; checker fades to its mean with distance so the
    # horizon carries learnable low-frequency structure, not aliased noise
    dy = d[:, 1]
    t = np.where(dy < -1e-8, (PLANE_Y - o[:, 1]) / dy, np.inf)
    ok = (t > 1e-3) & (t < best_t)
    if ok.any():
        p = o[ok] + t[ok, None] * d[ok]
        alb = _plane_albedo(p)
        mean = alb.mean(axis=0, keepdims=True)
        r_xz = np.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2)
        fade = np.exp(-r_xz / 12.0)[:, None]
        alb = alb * fade + mean * (1 - fade)
        shade = 0.25 + 0.75 * max(LIGHT_DIR[1], 0.0)
        rgb[ok] = alb * shade
        best_t[ok] = t[ok]

    # sky: cameras are INSIDE the sphere → far intersection root
    miss = ~np.isfinite(best_t)
    if miss.any():
        om, dm = o[miss], d[miss]
        b = np.sum(om * dm, -1)
        disc = b * b - (np.sum(om * om, -1) - SKY_R * SKY_R)
        t_far = -b + np.sqrt(np.maximum(disc, 0.0))
        hit_p = om + t_far[:, None] * dm
        rgb[miss] = _sky_rgb(hit_p / SKY_R)

    return rgb.astype(np.float32)


def render_view(c2w: np.ndarray, H: int, W: int, focal: float,
                supersample: int = 2) -> np.ndarray:
    ss = max(1, int(supersample))
    Hs, Ws, fs = H * ss, W * ss, focal * ss
    ys, xs = np.mgrid[0:Hs, 0:Ws].astype(np.float32)
    x = (xs + 0.5 - Ws / 2) / fs
    y = (ys + 0.5 - Hs / 2) / fs
    dirs = np.stack([x, -y, -np.ones_like(x)], -1).reshape(-1, 3)
    d = dirs @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d.shape)
    img = trace_360(o, d).reshape(Hs, Ws, 3)
    if ss > 1:
        img = img.reshape(H, ss, W, ss, 3).mean(axis=(1, 3))
    return img


def make_scene(root, views: int = 20, size: int = 128, radius: float = 4.0,
               val_views: int = 3):
    import imageio.v2 as imageio
    root = Path(root)
    camera_angle_x = 0.6911
    focal = 0.5 * size / np.tan(0.5 * camera_angle_x)

    for split, n, offs in [("train", views, 0.0), ("val", val_views, 0.123)]:
        (root / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for i in range(n):
            theta = 2 * np.pi * (i / n + offs)
            # lower elevations than the bounded scene: the horizon (hills +
            # sky) must be in frame, not just the floor
            phi = np.deg2rad(8 + 12 * np.sin(3.1 * i + offs))
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
    ap.add_argument("--val_views", type=int, default=3)
    args = ap.parse_args()
    make_scene(args.root, args.views, args.size, val_views=args.val_views)
    print(f"wrote unbounded-360 scene to {args.root}")
