"""Right-half PSNR of saved eval renders vs their GT frames.

Pairs `nerf-tpu-eval` baseline renders (mean-code, full image saved under
<eval_out>/rgb/frame_XXXX.png) with the NeRF-W half-image protocol
(`--refine_appearance` reports psnr_heldout_half on the RIGHT half): this
computes the SAME right-half metric for the unrefined baseline so the
refinement recovery is a paired comparison, not half-vs-full. PNG
quantization costs <0.05 dB — negligible at the 0.5 dB effects measured.

Usage: python scripts/half_psnr.py <eval_out> <data_root> [--split val]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np


def _srgb_read(p):
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(p), np.float32) / 255.0
    return img


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("eval_out")
    ap.add_argument("data_root")
    ap.add_argument("--split", default="val")
    args = ap.parse_args(argv)

    root = Path(args.data_root)
    meta = json.loads((root / f"transforms_{args.split}.json").read_text())
    frames = meta["frames"]

    rows = []
    for p in sorted((Path(args.eval_out) / "rgb").glob("frame_*.png")):
        fid = int(re.search(r"frame_(\d+)", p.name).group(1))
        fp = frames[fid]["file_path"]
        gt_path = root / (fp if fp.endswith(".png") else fp + ".png")
        gt = _srgb_read(gt_path)
        if gt.shape[-1] == 4:       # composite on white like the loader
            a = gt[..., 3:4]
            gt = gt[..., :3] * a + (1.0 - a)
        r = _srgb_read(p)[..., :3]
        if r.shape != gt.shape:
            print(f"skip frame {fid}: render {r.shape} vs gt {gt.shape}")
            continue
        half = gt.shape[1] // 2
        mse = float(np.mean((r[:, half:] - gt[:, half:]) ** 2))
        full = float(np.mean((r - gt) ** 2))
        rows.append({"index": fid,
                     "psnr_right_half": -10.0 * np.log10(max(mse, 1e-12)),
                     "psnr_full": -10.0 * np.log10(max(full, 1e-12))})
    out = {"frames": rows,
           "psnr_right_half_mean": float(np.mean(
               [r["psnr_right_half"] for r in rows])) if rows else None,
           "psnr_full_mean": float(np.mean(
               [r["psnr_full"] for r in rows])) if rows else None}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
