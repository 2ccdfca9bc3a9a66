"""Validation-schedule tests (semantics of validation_schedule.py:6-83)."""

import numpy as np

from nerf_sandbox_tpu.train.schedule import build_validation_steps, fast_forward


def test_fixed_interval():
    s = build_validation_steps(1000, base_every=300)
    assert s == [300, 600, 900, 1000]
    s = build_validation_steps(900, base_every=300)
    assert s == [300, 600, 900]


def test_power_schedule_properties():
    for S, E, p in [(1000, 10, 2.0), (50_000, 100, 2.0), (200, 50, 3.0)]:
        s = build_validation_steps(S, num_val_steps=E, schedule="power", power=p)
        assert len(s) == E
        assert s[-1] == S
        assert all(b > a for a, b in zip(s, s[1:]))       # strictly increasing
        assert s[0] >= 1
        # dense early: first half of events covers < half the steps
        assert s[E // 2 - 1] < S // 2


def test_power_gaps_sum_exactly():
    s = build_validation_steps(12345, num_val_steps=77)
    gaps = np.diff([0] + s)
    assert gaps.sum() == 12345
    assert gaps.min() >= 1


def test_defaults_to_100_events():
    s = build_validation_steps(50_000)
    assert len(s) == 100 and s[-1] == 50_000


def test_more_events_than_steps_clamps():
    s = build_validation_steps(10, num_val_steps=50)
    assert s == list(range(1, 11))


def test_fast_forward():
    s = [10, 20, 30]
    assert fast_forward(s, 1) == 0
    assert fast_forward(s, 10) == 0
    assert fast_forward(s, 11) == 1
    assert fast_forward(s, 31) == 3
