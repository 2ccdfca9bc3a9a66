"""PNG / MP4 / GIF artifact IO.

Parity target: ``render_utils.py:30-102`` (PNG writers + preview-MP4 packer
with pad-to-mod-16 and numeric step sort) and
``validation_renderer.py:708-764`` (triplet MP4 libx264 q8 yuv420p + GIF).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Callable, List, Optional

import numpy as np


def save_rgb_png(img, path) -> None:
    """HxWx3 float [0,1] → uint8 PNG."""
    import imageio.v2 as imageio
    arr = np.clip(np.asarray(img), 0.0, 1.0)
    imageio.imwrite(Path(path), (arr * 255.0 + 0.5).astype(np.uint8))


def save_gray_png(img, path) -> None:
    import imageio.v2 as imageio
    arr = np.clip(np.asarray(img), 0.0, 1.0)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    imageio.imwrite(Path(path), (arr * 255.0 + 0.5).astype(np.uint8))


def _pad_to_mod(img: np.ndarray, mod: int) -> np.ndarray:
    if not mod:
        return img
    H, W = img.shape[:2]
    ph, pw = (mod - H % mod) % mod, (mod - W % mod) % mod
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
        img = np.pad(img, pad, mode="edge")
    return img


def _numeric_sort(paths: List[Path]) -> List[Path]:
    def key(p: Path):
        m = re.search(r"(\d+)", p.stem)
        return (int(m.group(1)) if m else -1, p.name)
    return sorted(paths, key=key)


def export_video_from_pngs(frame_paths: List[Path], out_path, *, fps: int = 24,
                           pad_to_mod: int = 16,
                           cancel_flag_getter: Optional[Callable[[], bool]] = None,
                           ) -> Optional[Path]:
    """Pack PNG frames into an MP4 (libx264, quality 8). Returns None when
    cancelled or no frames exist."""
    import imageio.v2 as imageio
    frames = _numeric_sort([Path(p) for p in frame_paths])
    if not frames:
        return None
    imgs = []
    for p in frames:
        if cancel_flag_getter and cancel_flag_getter():
            return None
        imgs.append(_pad_to_mod(imageio.imread(p), pad_to_mod))
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    try:
        imageio.mimwrite(out_path, imgs, fps=fps, codec="libx264", quality=8,
                         pixelformat="yuv420p")
    except Exception as e:          # no ffmpeg → degrade to GIF
        print(f"[VIDEO] mp4 export failed ({e}); writing GIF instead")
        out_path = out_path.with_suffix(".gif")
        imageio.mimwrite(out_path, imgs, duration=1.0 / fps)
    return out_path


def export_gif_from_pngs(frame_paths: List[Path], out_path, *, fps: int = 24,
                         cancel_flag_getter: Optional[Callable[[], bool]] = None,
                         ) -> Optional[Path]:
    import imageio.v2 as imageio
    frames = _numeric_sort([Path(p) for p in frame_paths])
    if not frames:
        return None
    imgs = []
    for p in frames:
        if cancel_flag_getter and cancel_flag_getter():
            return None
        imgs.append(imageio.imread(p))
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    imageio.mimwrite(out_path, imgs, duration=1.0 / fps)
    return out_path


def export_triplet_videos(frames_dir, out_dir, video_name: str, *,
                          fps: int = 24, kinds=("rgb", "depth", "opacity"),
                          cancel_flag_getter=None) -> List[Path]:
    """MP4+GIF per {rgb, depth, opacity} subfolder of frames_dir
    (validation_renderer.py:708-764)."""
    frames_dir, out_dir = Path(frames_dir), Path(out_dir)
    written = []
    for kind in kinds:
        srcs = list((frames_dir / kind).glob("*.png"))
        if not srcs:
            continue
        mp4 = export_video_from_pngs(srcs, out_dir / f"{video_name}_{kind}.mp4",
                                     fps=fps, cancel_flag_getter=cancel_flag_getter)
        gif = export_gif_from_pngs(srcs, out_dir / f"{video_name}_{kind}.gif",
                                   fps=fps, cancel_flag_getter=cancel_flag_getter)
        written += [p for p in (mp4, gif) if p]
    return written
