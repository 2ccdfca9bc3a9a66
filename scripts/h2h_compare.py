"""Head-to-head PSNR-trajectory comparison: torch reference vs this repo.

Parses the ``[VAL] step=N mean PSNR=X.XX dB`` lines both trainers print
(reference: ``trainer.py:807``; repo: ``train/trainer.py``) from the two run
logs and reports the per-step delta table (BASELINE.md procedure / VERDICT
r1 item 2).

    python scripts/h2h_compare.py ref.log jax.log --label spheres
"""

from __future__ import annotations

import argparse
import re
import sys

VAL_RE = re.compile(r"\[VAL\] step=(\d+) mean PSNR=([-\d.]+) dB")


def parse_val_psnr(path: str) -> dict[int, float]:
    out: dict[int, float] = {}
    with open(path, "r", errors="replace") as f:
        for line in f:
            m = VAL_RE.search(line)
            if m:
                out[int(m.group(1))] = float(m.group(2))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_log")
    ap.add_argument("jax_log")
    ap.add_argument("--label", default="")
    args = ap.parse_args()

    ref = parse_val_psnr(args.ref_log)
    jax = parse_val_psnr(args.jax_log)
    steps = sorted(set(ref) & set(jax))
    if not steps:
        print(f"no matched validation steps (ref has {sorted(ref)}, "
              f"jax has {sorted(jax)})")
        return 1

    tag = f" ({args.label})" if args.label else ""
    print(f"| step | ref PSNR (dB){tag} | jax PSNR (dB) | Δ (jax−ref) |")
    print("|---|---|---|---|")
    deltas = []
    for s in steps:
        d = jax[s] - ref[s]
        deltas.append(d)
        print(f"| {s} | {ref[s]:.2f} | {jax[s]:.2f} | {d:+.2f} |")
    final = deltas[-1]
    mean = sum(deltas) / len(deltas)
    print(f"\nmean Δ over {len(steps)} events: {mean:+.2f} dB; "
          f"final-step Δ: {final:+.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
