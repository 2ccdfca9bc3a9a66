"""Validation-step scheduling.

Parity target: ``nerf_sandbox/source/utils/validation_schedule.py:6-83``
(``build_validation_steps``): a strictly-increasing list of step indices in
[1, max_steps] that always ends at max_steps.  Two modes:

* fixed interval (``base_every``), max_steps appended if missed
* power-law (default ~100 events): continuous target CDF t(j) = (j/E)^p
  converted to integer gaps >= 1 that sum exactly to max_steps via
  floor + largest-fraction distribution — denser validation early.
"""

from __future__ import annotations

import numpy as np


def build_validation_steps(max_steps: int, *, base_every: int | None = None,
                           num_val_steps: int | None = None,
                           schedule: str = "power",
                           power: float = 2.0) -> list[int]:
    S = int(max_steps)

    if base_every is not None and base_every > 0:
        steps = list(range(int(base_every), S + 1, int(base_every)))
        if not steps or steps[-1] != S:
            steps.append(S)
        return steps

    if num_val_steps is None or num_val_steps <= 0:
        num_val_steps = min(100, S)
    E = min(int(num_val_steps), S)

    if schedule.lower() != "power":
        gap = S / E
        steps = [max(1, int(round((i + 1) * gap))) for i in range(E)]
        for k in range(1, E):
            steps[k] = max(steps[k], steps[k - 1] + 1)
        steps[-1] = S
        return steps

    j = np.arange(0, E + 1, dtype=np.float64)
    cdf = (j / E) ** float(power)
    frac_gaps = np.diff(cdf)

    gaps = np.ones(E, dtype=np.int64)
    remaining = S - E
    if remaining > 0:
        raw = frac_gaps * remaining
        floor_part = np.floor(raw).astype(np.int64)
        leftovers = int(remaining - floor_part.sum())
        if leftovers > 0:
            idx = np.argsort(raw - floor_part)[-leftovers:]
            floor_part[idx] += 1
        gaps = gaps + floor_part

    steps = np.cumsum(gaps)
    steps[-1] = S
    return steps.tolist()


def fast_forward(steps: list[int], start_step: int) -> int:
    """Index of the first scheduled step >= start_step (trainer.py:685-696)."""
    i = 0
    while i < len(steps) and steps[i] < start_step:
        i += 1
    return i
