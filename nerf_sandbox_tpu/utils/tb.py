"""TensorBoard logging helper.

Parity target: ``nerf_sandbox/source/utils/tensorboard_utils.py:26-147``
(``TensorBoardLogger``): lazy SummaryWriter creation on first use, graceful
degrade when tensorboard isn't importable, ``add_scalar``, ``add_image``
accepting HWC/CHW uint8/float arrays with a max-side downscale, and a
``log_validation_images`` helper that normalises depth to [near, far].

Inputs are numpy/JAX arrays (host side); device arrays are pulled once here.
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np


class TensorBoardLogger:
    def __init__(self, enabled: bool = False, logdir: Optional[str] = None,
                 image_max_side: int = 512) -> None:
        self.enabled = bool(enabled)
        self.logdir = logdir
        self.image_max_side = int(image_max_side)
        self.writer = None
        self._failed = False
        # Lazy init may race between the train loop (scalars) and the async
        # validation worker (images) — guard creation with a lock.
        self._init_lock = threading.Lock()

    # ---------- internals ----------

    def _ensure_writer(self) -> bool:
        if not self.enabled or self._failed:
            return self.writer is not None
        if self.writer is None:
            with self._init_lock:
                if self.writer is not None or self._failed:
                    return self.writer is not None
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self.writer = SummaryWriter(log_dir=self.logdir)
                except Exception as e:   # missing package → degrade silently
                    print(f"[TB] disabled ({e})")
                    self._failed = True
                    return False
        return True

    @staticmethod
    def _to_hwc_uint8(img) -> np.ndarray:
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
            arr = np.moveaxis(arr, 0, -1)          # CHW → HWC
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0.0, 1.0)
            arr = (arr * 255.0 + 0.5).astype(np.uint8)
        return arr

    def _downscale(self, arr: np.ndarray) -> np.ndarray:
        H, W = arr.shape[:2]
        m = max(H, W)
        if self.image_max_side and m > self.image_max_side:
            s = self.image_max_side / m
            try:
                import cv2
                arr = cv2.resize(arr, (max(1, int(W * s)), max(1, int(H * s))),
                                 interpolation=cv2.INTER_AREA)
            except Exception:
                stride = int(np.ceil(m / self.image_max_side))
                arr = arr[::stride, ::stride]
        return arr

    # ---------- public API ----------

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self._ensure_writer():
            self.writer.add_scalar(tag, float(value), int(step))

    def add_image(self, tag: str, img, step: int) -> None:
        if self._ensure_writer():
            arr = self._downscale(self._to_hwc_uint8(img))
            self.writer.add_image(tag, arr, int(step), dataformats="HWC")

    def log_validation_images(self, prefix: str, step: int, rgb, acc=None,
                              depth=None, near: float = 0.0,
                              far: float = 1.0) -> None:
        self.add_image(f"{prefix}/rgb", rgb, step)
        if acc is not None:
            self.add_image(f"{prefix}/opacity", np.asarray(acc).squeeze(-1)
                           if np.asarray(acc).ndim == 3 else acc, step)
        if depth is not None:
            d = np.asarray(depth)
            if d.ndim == 3:
                d = d.squeeze(-1)
            d = np.clip((d - near) / (far - near + 1e-8), 0.0, 1.0)
            self.add_image(f"{prefix}/depth", d, step)

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
            self.writer = None
