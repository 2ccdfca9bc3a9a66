"""Copy a Blender-format scene with jittered TRAIN poses (pose_opt harness).

Role: measurement input for the --pose_opt / --barf_anneal_steps quality
rows (scripts/dyn_pose_quality.sh). Applies an se3 jitter — a random-axis
rotation of ``--rot_deg`` degrees and a translation of ``--trans`` world
units — to every train-split camera, leaving the val split clean, so a
training run must recover the registration to render the clean holdout
views well. Images are symlinked (fall back to copy), only the
transforms JSON is rewritten.

  python scripts/perturb_poses.py /tmp/tex /tmp/tex_jitpose \
      --rot_deg 2.0 --trans 0.05 --seed 0
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

import numpy as np


def rot_about(axis: np.ndarray, ang: float) -> np.ndarray:
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--rot_deg", type=float, default=2.0)
    ap.add_argument("--trans", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--splits", default="train",
                    help="comma list of splits to jitter (others copied)")
    args = ap.parse_args()
    src, dst = Path(args.src), Path(args.dst)
    jitter = set(args.splits.split(","))
    rng = np.random.default_rng(args.seed)
    dst.mkdir(parents=True, exist_ok=True)

    for tf in sorted(src.glob("transforms_*.json")):
        split = tf.stem.replace("transforms_", "")
        meta = json.loads(tf.read_text())
        if split in jitter:
            for fr in meta["frames"]:
                c2w = np.asarray(fr["transform_matrix"], np.float64)
                R = rot_about(rng.standard_normal(3),
                              np.deg2rad(args.rot_deg))
                t = args.trans * rng.standard_normal(3)
                c2w[:3, :3] = R @ c2w[:3, :3]
                c2w[:3, 3] += t
                fr["transform_matrix"] = c2w.tolist()
        (dst / tf.name).write_text(json.dumps(meta))
        ddir = dst / split
        sdir = src / split
        if sdir.is_dir() and not ddir.exists():
            try:
                ddir.symlink_to(sdir.resolve())
            except OSError:
                shutil.copytree(sdir, ddir)
    print(f"wrote jittered scene to {dst} (rot {args.rot_deg} deg, "
          f"trans {args.trans}, splits {sorted(jitter)})")


if __name__ == "__main__":
    main()
