"""Procedural forward-facing LLFF test scene (poses_bounds.npy + images/).

Ray-traces the shared sphere world (tests/make_sphere_scene.py) from a
forward-facing camera arc and writes the nerf-pytorch on-disk format, so
the NDC training path can be validated end-to-end on real 3-D structure:

    python tests/make_llff_scene.py /tmp/llff_spheres --views 12 --size 128
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
try:
    from tests.make_sphere_scene import render_view
except ModuleNotFoundError:      # invoked as a plain script
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from make_sphere_scene import render_view


def forward_pose(dx: float, dy: float, dist: float) -> np.ndarray:
    """Camera at (dx, dy, dist) looking at the origin (OpenGL c2w)."""
    eye = np.array([dx, dy, dist], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, -fwd
    c2w[:3, 3] = eye
    return c2w


def make_llff_scene(root, views: int = 12, size: int = 128,
                    dist: float = 4.0, textured: bool = False):
    import imageio.v2 as imageio
    root = Path(root)
    img_dir = root / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    focal = 0.5 * size / np.tan(0.5 * 0.6911)

    rows = []
    for i in range(views):
        ang = 2 * np.pi * i / views
        dx, dy = 0.45 * np.cos(ang), 0.3 * np.sin(ang)
        c2w = forward_pose(dx, dy, dist)
        img = render_view(c2w, size, size, focal,
                          textured=textured, supersample=2 if textured else 1)
        # composite on white (LLFF images carry no alpha)
        rgb = img[..., :3] * img[..., 3:4] + (1.0 - img[..., 3:4])
        imageio.imwrite(img_dir / f"img_{i:03d}.png",
                        (rgb * 255 + 0.5).astype(np.uint8))

        # OpenGL [right, up, back] → LLFF columns [down, right, back]
        R = c2w[:3, :3]
        m = np.stack([-R[:, 1], R[:, 0], R[:, 2]], axis=1)
        hwf = np.array([size, size, focal], np.float32)
        p35 = np.concatenate([m, c2w[:3, 3:4], hwf[:, None]], axis=1)
        if textured:
            # ground disc (radius PLANE_R=2.1) extends toward the camera:
            # front edge is ~1.9 from the eye; far edge + offsets ~6.3
            near = dist - 2.5
            far = dist + 2.6
        else:
            near = dist - 1.3   # sphere world spans |x| <= ~1.25
            far = dist + 1.5
        rows.append(np.concatenate([p35.reshape(-1), [near, far]]))
    np.save(root / "poses_bounds.npy", np.stack(rows).astype(np.float64))
    return root


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--textured", action="store_true",
                    help="checker/noise albedos + checkered ground disc")
    args = ap.parse_args()
    make_llff_scene(args.root, args.views, args.size, textured=args.textured)
    print(f"wrote LLFF sphere scene to {args.root}")
