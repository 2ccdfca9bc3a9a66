"""Apples-to-apples head-to-head PSNR from saved validation renders.

Both trainers save step-tagged validation renders under
``<out_dir>/validation/val_idx0000/rgb/step_*.png``. This computes PSNR of
every such render against the dataset ground truth with ONE shared
procedure (composite RGBA on white when the run trained white_bkgd, resize
GT bilinear to the render resolution) and prints the per-step delta table.

Why not the trainers' own printed numbers: the reference's validation PSNR
is broken on RGBA datasets — its GT fetch never composites alpha
(validation_renderer.py:230-266) and ``composite_on_load`` reads an
attribute the trainer never sets (:62), so it compares white-composited
predictions against black-backed GT (measured 1.5 dB on a scene it renders
at 18+ dB). This repo's printed PSNR is correct; the post-hoc procedure
here just guarantees symmetry.

    python scripts/h2h_psnr.py --ref_dir /tmp/h2h/ref_spheres \
        --jax_dir /tmp/h2h/jax_spheres --data_root /tmp/h2h_spheres \
        --data_kind blender --label spheres
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_gt(data_root: str, kind: str, white_bkgd: bool = True,
            index: int = 0, holdout_every: int = 0) -> np.ndarray:
    """Ground-truth RGB (H, W, 3) float32 for validation frame ``index``,
    using this repo's loaders (parity-tested against the reference's)."""
    if kind == "llff":
        from nerf_sandbox_tpu.data.llff_loader import LLFFSceneLoader
        loader = LLFFSceneLoader(data_root, white_bkgd=white_bkgd,
                                 holdout_every=holdout_every)
    else:
        from nerf_sandbox_tpu.data.blender_loader import BlenderSceneLoader
        loader = BlenderSceneLoader(data_root, white_bkgd=white_bkgd)
    try:
        scene = loader.load("val")
    except FileNotFoundError:
        scene = loader.load("test")
    img = np.asarray(scene.frames[index].image, np.float32)
    if img.shape[-1] == 4:
        a = img[..., 3:4]
        img = img[..., :3] * a + (1.0 - a) * (1.0 if white_bkgd else 0.0)
    return img


def _resize(img: np.ndarray, H: int, W: int) -> np.ndarray:
    if img.shape[:2] == (H, W):
        return img
    import cv2
    return cv2.resize(img, (W, H), interpolation=cv2.INTER_LINEAR)


def psnrs_for_run(run_dir: str, gt: np.ndarray,
                  index: int = 0) -> dict[int, float]:
    import imageio.v2 as iio
    out: dict[int, float] = {}
    pat = f"validation/val_idx{index:04d}/rgb/step_*.png"
    for p in sorted(Path(run_dir).glob(pat)):
        step = int(re.search(r"step_(\d+)", p.name).group(1))
        pred = iio.imread(p).astype(np.float32) / 255.0
        g = _resize(gt, pred.shape[0], pred.shape[1])
        mse = float(((pred - g) ** 2).mean())
        out[step] = -10.0 * np.log10(max(mse, 1e-10))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_dir", required=True)
    ap.add_argument("--jax_dir", required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--data_kind", choices=["blender", "llff"], required=True)
    ap.add_argument("--label", default="")
    ap.add_argument("--val_indices", default="0",
                    help="comma-separated validation frame indices; PSNR is "
                         "reported per step as the mean over frames")
    ap.add_argument("--holdout_every", type=int, default=0,
                    help="LLFF periodic holdout (must match the runs)")
    args = ap.parse_args()

    idxs = [int(s) for s in args.val_indices.split(",") if s.strip()]
    # mean PSNR over frames at each step, for each side
    ref_acc: dict[int, list] = {}
    jax_acc: dict[int, list] = {}
    for i in idxs:
        gt = load_gt(args.data_root, args.data_kind, index=i,
                     holdout_every=args.holdout_every)
        for acc, run in ((ref_acc, args.ref_dir), (jax_acc, args.jax_dir)):
            for s, v in psnrs_for_run(run, gt, index=i).items():
                acc.setdefault(s, []).append(v)
    ref = {s: float(np.mean(v)) for s, v in ref_acc.items() if len(v) == len(idxs)}
    jx = {s: float(np.mean(v)) for s, v in jax_acc.items() if len(v) == len(idxs)}
    steps = sorted(set(ref) & set(jx))
    if not steps:
        print(f"no matched steps: ref={sorted(ref)} jax={sorted(jx)}")
        return 1
    tag = f" ({args.label}, {len(idxs)} frame(s))" if args.label else ""
    print(f"| step | torch reference (dB){tag} | this repo (dB) | Δ |")
    print("|---|---|---|---|")
    deltas = []
    for s in steps:
        d = jx[s] - ref[s]
        deltas.append(d)
        print(f"| {s} | {ref[s]:.2f} | {jx[s]:.2f} | {d:+.2f} |")
    print(f"\nmean Δ {np.mean(deltas):+.2f} dB | final-step Δ {deltas[-1]:+.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
