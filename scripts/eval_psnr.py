"""Validation PSNR of a trained checkpoint under arbitrary EVAL flags.

Role: quality-neutrality measurements for eval-path knobs — e.g. is
``--eval_kp_pool 2`` PSNR-neutral on a trained kplanes run? Loads the
run's checkpoint with the extra flags applied, renders the requested val
indices through the normal ValidationRenderer (same PSNR definition as
training logs, validation_renderer.py:394-542 parity), prints one JSON
line.

  python scripts/eval_psnr.py --out_dir /tmp/kp_run --data_root /tmp/spheres \
      [--indices 0,1,2] [--res_scale 1.0] [extra trainer flags...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--data_kind", default="blender")
    ap.add_argument("--indices", default="0,1,2")
    ap.add_argument("--res_scale", type=float, default=1.0)
    args, extra = ap.parse_known_args()

    from nerf_sandbox_tpu.config import (apply_path_defaults, build_argparser,
                                         make_cfg_from_args)
    from nerf_sandbox_tpu.train.trainer import Trainer

    argv = ["--data_root", args.data_root, "--out_dir", args.out_dir,
            "--data_kind", args.data_kind, *extra]
    cfg = make_cfg_from_args(build_argparser().parse_args(argv))
    cfg = apply_path_defaults(cfg, args.data_kind)
    tr = Trainer(cfg, eval_only=True)
    step = tr.load_latest_checkpoint(load_optim=False)
    if (tr.sampling_mode == "occupancy"
            and not getattr(tr, "_occ_grid_restored", False)):
        tr._rebuild_occupancy(step)      # grid-less (old-format) checkpoint
    idxs = [int(i) for i in args.indices.split(",") if i != ""]
    pc, pf = tr.eval_params()
    _, metrics = tr.valr.render_indices_at_step(
        step, idxs, pc, pf, use_mask="auto", res_scale=args.res_scale)
    print(json.dumps({"out_dir": args.out_dir, "step": step,
                      "extra_flags": extra,
                      "psnr_mean": metrics.get("psnr_mean"),
                      "psnr_per_frame": metrics.get("psnr_per_frame")}))


if __name__ == "__main__":
    sys.exit(main())
