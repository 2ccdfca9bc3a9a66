"""LLFF (forward-facing) dataset loader, faithful to the nerf-pytorch pipeline.

Parity target: ``nerf_sandbox/source/data/loaders/llff_loader.py:19-250``:

* ``poses_bounds.npy`` (N,17) → (3,5,N) poses + (2,N) bounds
* axis reorder [down,right,back] → OpenGL [right,up,back]
  (columns: [r1, -r0, r2, t, hwf])
* translations + bounds scaled by ``sc = 1 / (min(bounds) · bd_factor)``
* recenter to the average pose (z = mean back-axis, up = mean up-axis,
  Gram-Schmidt orthonormalisation, translation = mean center)
* holdout split: single nearest-to-mean-center test view, or periodic
  every-N with offset; train = complement
* requires a pre-minified ``images_{downscale}`` directory when
  downscale > 1 (no per-frame resize); PNGs read with ``apply_gamma=True``
* per-frame K = [[f,0,W/2],[0,f,H/2],[0,0,1]] with f scaled by 1/factor
* ``get_global_near_far(percentile=(5,95))`` over the scaled bounds
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np
import imageio.v2 as imageio

from nerf_sandbox_tpu.data.scene import Frame, Scene


def _unit(v: np.ndarray, eps: float = 0.0) -> np.ndarray:
    return v / (np.linalg.norm(v) + eps)


def average_pose(R_all: np.ndarray, t_all: np.ndarray, *, sum_axes: bool = False) -> np.ndarray:
    """Average c2w (4x4) from per-frame rotations (N,3,3) and centers (N,3).

    ``sum_axes=False`` averages axes (loader recenter, llff_loader.py:190-205);
    the path generator's variant sums them — direction is identical.
    """
    reduce = np.sum if sum_axes else np.mean
    z = _unit(reduce(R_all[:, :, 2], axis=0))
    up = reduce(R_all[:, :, 1], axis=0)
    right = _unit(np.cross(_unit(up), z))
    up = _unit(np.cross(z, right))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, z
    c2w[:3, 3] = t_all.mean(axis=0)
    return c2w


class LLFFSceneLoader:
    camera_convention = "opengl"

    def __init__(self, root, downscale: int = 1, white_bkgd: bool = True, *,
                 bd_factor: float = 0.75, use_llff_holdout: bool = True,
                 holdout_every: int = 0, holdout_offset: int = 0) -> None:
        self.root = Path(root)
        self.downscale = int(downscale)
        self.white_bkgd = bool(white_bkgd)
        self.bd_factor = float(bd_factor)
        self.use_llff_holdout = bool(use_llff_holdout)
        self.holdout_every = int(holdout_every)
        self.holdout_offset = int(holdout_offset)
        self.norm_scale = 1.0
        self._raw_cache = None

    # ---------- internals ----------

    def _image_dir_and_factor(self) -> tuple[Path, int]:
        cand = self.root / f"images_{self.downscale}"
        if cand.is_dir():
            return cand, self.downscale
        if self.downscale != 1:
            raise FileNotFoundError(
                f"Expected pre-minified folder {cand} (create it, or set downscale=1)")
        base = self.root / "images"
        if not base.exists():
            raise FileNotFoundError(f"Missing images directory: {base}")
        return base, 1

    @staticmethod
    def _png_has_gamma_chunk(path: Path) -> bool:
        """True if the PNG carries a gAMA chunk (the only case where the
        reference's ``apply_gamma=True`` read changes pixel values).

        Walks the real chunk structure (length/type framing) up to the
        first IDAT — a raw substring scan would both miss a gAMA sitting
        past an arbitrary prefix and false-positive on the byte sequence
        inside compressed iCCP/zTXt data."""
        try:
            with open(path, "rb") as f:
                if f.read(8) != b"\x89PNG\r\n\x1a\n":
                    return False
                while True:
                    hdr = f.read(8)
                    if len(hdr) < 8:
                        return False
                    (length,) = np.frombuffer(hdr[:4], ">u4")
                    ctype = hdr[4:8]
                    if ctype == b"gAMA":
                        return True
                    if ctype in (b"IDAT", b"IEND"):
                        return False      # gAMA must precede IDAT (spec)
                    f.seek(int(length) + 4, 1)    # data + CRC
        except OSError:
            return False

    @staticmethod
    def _read_image_gamma(path: Path) -> np.ndarray:
        if path.suffix.lower() == ".png":
            try:
                arr = imageio.imread(path, apply_gamma=True)
            except TypeError:
                # this imageio has no apply_gamma kwarg. apply_gamma only
                # alters pixels when the PNG has a gAMA chunk — the plain
                # read is bit-exact otherwise. Fail loudly rather than
                # silently diverge from the reference pipeline.
                if LLFFSceneLoader._png_has_gamma_chunk(path):
                    raise RuntimeError(
                        f"{path} carries a PNG gAMA chunk but this imageio "
                        "does not support apply_gamma=True; pixel values "
                        "would silently differ from the reference LLFF "
                        "pipeline. Install imageio with freeimage support "
                        "or strip the gAMA chunk.")
                arr = imageio.imread(path)
        else:
            arr = imageio.imread(path)
        arr = arr.astype(np.float32)
        if arr.max() > 1.0:
            arr /= 255.0
        return arr

    def _load_raw(self):
        """→ (poses (N,3,5) OpenGL, bounds (N,2), files, img_dir, factor).

        Cached: the trainer calls load('train'), load('val') and
        get_global_near_far at startup — one npy read + probe decode total.
        Poses/bounds are returned as copies (callers mutate them in place).
        """
        if self._raw_cache is not None:
            poses, bounds, files, img_dir, factor = self._raw_cache
            return poses.copy(), bounds.copy(), files, img_dir, factor
        npy = self.root / "poses_bounds.npy"
        if not npy.exists():
            raise FileNotFoundError(f"Missing {npy}")
        arr = np.load(npy)                                    # (N, 17)
        poses = arr[:, :-2].reshape(-1, 3, 5).astype(np.float32)   # (N,3,5) [down,right,back]
        bounds = arr[:, -2:].astype(np.float32)                     # (N,2)

        # Reorder columns to OpenGL [right, up, back, t, hwf].
        poses = np.concatenate(
            [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], axis=2)

        img_dir, factor = self._image_dir_and_factor()
        files = sorted(p.name for p in img_dir.iterdir()
                       if p.suffix.lower() in {".png", ".jpg", ".jpeg"})
        if len(files) != poses.shape[0]:
            raise RuntimeError(
                f"Mismatch between imgs ({len(files)}) and poses ({poses.shape[0]})")

        im0 = self._read_image_gamma(img_dir / files[0])
        poses[:, 0, 4] = float(im0.shape[0])
        poses[:, 1, 4] = float(im0.shape[1])
        poses[:, 2, 4] = poses[:, 2, 4] / float(factor)
        self._raw_cache = (poses, bounds, files, img_dir, factor)
        return poses.copy(), bounds.copy(), files, img_dir, factor

    def _recenter(self, poses: np.ndarray) -> np.ndarray:
        """Recenter (N,3,5) poses to the average pose (llff_loader.py:207-222)."""
        avg = average_pose(poses[:, :, :3], poses[:, :, 3])
        w2c = np.linalg.inv(avg)
        out = poses.copy()
        c2w = np.tile(np.eye(4, dtype=np.float32), (poses.shape[0], 1, 1))
        c2w[:, :3, :4] = poses[:, :, :4]
        out[:, :, :4] = (w2c[None] @ c2w)[:, :3, :4]
        return out

    @staticmethod
    def _holdout_index(poses: np.ndarray) -> int:
        """Frame nearest to the average camera center (llff_loader.py:225-231)."""
        avg = average_pose(poses[:, :, :3], poses[:, :, 3])
        d = np.sum((poses[:, :3, 3] - avg[:3, 3]) ** 2, axis=-1)
        return int(np.argmin(d))

    # ---------- public API ----------

    def load(self, split: str = "train", image_filter=None) -> Scene:
        """``image_filter(i, n) -> bool`` (i = index within the returned
        split): frames it rejects keep pose/K but get a ZERO image — the
        per-host data-sharding path (``--shard_scene`` multi-process) where
        each host only decodes the frames its devices own.  The first frame
        is always decoded (shape/channel probe)."""
        poses, bounds, files, img_dir, factor = self._load_raw()

        sc = 1.0 / (float(bounds.min()) * self.bd_factor)
        poses[:, :3, 3] *= sc
        bounds = bounds * sc
        poses = self._recenter(poses)
        self.norm_scale = sc

        N = poses.shape[0]
        if self.holdout_every > 0:
            i_test = np.arange(N)[self.holdout_offset::self.holdout_every]
        elif self.use_llff_holdout:
            i_test = np.array([self._holdout_index(poses)], int)
        else:
            i_test = np.array([], int)
        test_set = set(i_test.tolist())
        i_train = np.array([i for i in range(N) if i not in test_set], int)
        use_idx = i_train if split == "train" else i_test

        frames: List[Frame] = []
        probe_shape = None
        n_split = len(use_idx)
        for j, i in enumerate(use_idx.tolist()):
            H = int(round(poses[i, 0, 4]))
            W = int(round(poses[i, 1, 4]))
            f = float(poses[i, 2, 4])
            if image_filter is None or j == 0 or image_filter(j, n_split):
                img = self._read_image_gamma(img_dir / files[i])
                probe_shape = img.shape
            else:
                img = np.zeros(probe_shape, np.float32)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :4] = poses[i, :, :4]
            K = np.array([[f, 0.0, 0.5 * W],
                          [0.0, f, 0.5 * H],
                          [0.0, 0.0, 1.0]], dtype=np.float32)
            frames.append(Frame(image=img.astype(np.float32), K=K, c2w=c2w,
                                meta={"file_path": str(img_dir / files[i]),
                                      "basename": files[i],
                                      "convention": self.camera_convention}))
        return Scene(frames=frames, white_bkgd=self.white_bkgd)

    def get_global_near_far(self, percentile: Tuple[float, float] = (5.0, 95.0)):
        _, bounds, _, _, _ = self._load_raw()
        sc = 1.0 / (float(bounds.min()) * self.bd_factor)
        b = bounds * sc
        return (float(np.percentile(b, percentile[0])),
                float(np.percentile(b, percentile[1])))
