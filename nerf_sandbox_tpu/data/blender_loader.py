"""Blender synthetic dataset loader.

Parity target: ``nerf_sandbox/source/data/loaders/blender_loader.py:17-140``:

* parse ``transforms_{split}.json``; strict ``<root>/<file_path>.png``
  resolution (raises FileNotFoundError with the offending paths)
* K from ``camera_angle_x``: f = 0.5·W / tan(θ/2), cx = W/2, cy = H/2
* integer downscale via cv2 INTER_AREA
* optional mean-translation centering (``centering="auto"``) and uniform
  ``scene_scale`` multiplier on camera translations
* camera convention: OpenGL (+X right, +Y up, looks -Z)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List

import numpy as np
import imageio.v2 as imageio

from nerf_sandbox_tpu.data.scene import Frame, Scene


class BlenderSceneLoader:
    camera_convention = "opengl"

    def __init__(self, root, downscale: int = 1, white_bkgd: bool = True, *,
                 centering: str = "none", scene_scale: float = 1.0) -> None:
        self.root = Path(root)
        self.downscale = int(downscale)
        self.white_bkgd = bool(white_bkgd)
        self.centering = str(centering)
        self.scene_scale = float(scene_scale)

    # ---------- internals ----------

    def _read_image(self, path: Path) -> np.ndarray:
        img = imageio.imread(path).astype(np.float32) / 255.0
        if self.downscale > 1:
            import cv2
            H, W = img.shape[:2]
            img = cv2.resize(img, (W // self.downscale, H // self.downscale),
                             interpolation=cv2.INTER_AREA)
        return img

    @staticmethod
    def _intrinsics(W: int, H: int, camera_angle_x: float) -> np.ndarray:
        f = 0.5 * W / np.tan(0.5 * camera_angle_x)
        return np.array([[f, 0.0, 0.5 * W],
                         [0.0, f, 0.5 * H],
                         [0.0, 0.0, 1.0]], dtype=np.float32)

    def _resolve_image_path(self, file_path: str) -> Path:
        p = Path(file_path)
        target = (p if p.is_absolute() else (self.root / p)).with_suffix(".png")
        target = target.resolve()
        if not target.exists():
            raise FileNotFoundError(
                f"Image file not found: file_path={file_path!r} "
                f"root={self.root} expected={target}")
        return target

    # ---------- public API ----------

    def load(self, split: str = "train", image_filter=None) -> Scene:
        """``image_filter(i, n) -> bool``: frames it rejects keep pose/K but
        get a ZERO image — the per-host data-sharding path (``--shard_scene``
        multi-process) where each host only decodes the frames its devices
        own.  Frame 0 is always decoded (it is the shape/channel probe)."""
        tf_path = self.root / f"transforms_{split}.json"
        if not tf_path.exists():
            raise FileNotFoundError(f"Could not find transforms file: {tf_path}")
        meta = json.loads(tf_path.read_text())

        frames_meta = meta["frames"]
        first = self._read_image(self._resolve_image_path(frames_meta[0]["file_path"]))
        H, W = first.shape[:2]
        K = self._intrinsics(W, H, float(meta["camera_angle_x"]))

        n_split = len(frames_meta)
        images, c2ws = [], []
        for i, fr in enumerate(frames_meta):
            if i == 0:
                images.append(first)
            elif image_filter is None or image_filter(i, n_split):
                images.append(self._read_image(self._resolve_image_path(fr["file_path"])))
            else:
                images.append(np.zeros(first.shape, np.float32))
            c2ws.append(np.array(fr["transform_matrix"], dtype=np.float32))

        c2ws = np.stack(c2ws, axis=0)                       # (N, 4, 4)
        if self.centering == "auto" and len(c2ws):
            c2ws[:, :3, 3] -= c2ws[:, :3, 3].mean(axis=0)
        if self.scene_scale != 1.0:
            c2ws[:, :3, 3] *= self.scene_scale

        # D-NeRF-format per-frame "time" (dynamic scenes): pass through as
        # Frame.time; absent = static (None)
        times = [fr.get("time") for fr in frames_meta]
        frames: List[Frame] = [
            Frame(image=img, K=K.copy(), c2w=c2w,
                  time=None if t is None else float(t))
            for img, c2w, t in zip(images, c2ws, times)
        ]
        return Scene(frames=frames, white_bkgd=self.white_bkgd)
