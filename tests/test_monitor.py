"""DeviceMonitor: HBM-pressure guard + --thermal_throttle behavior
(reference gpu_thermal.py:29-90 role parity)."""

from nerf_sandbox_tpu.utils.device_monitor import DeviceMonitor


def _patched(monitor, frac):
    monitor.hbm_stats = lambda: {"bytes_in_use": int(frac * 100),
                                 "bytes_limit": 100,
                                 "peak_bytes_in_use": int(frac * 100)}
    return monitor


def test_guard_throttles_only_when_enabled():
    m = _patched(DeviceMonitor(enable_throttle=False, check_every=1), 0.97)
    assert m.guard(1) is False          # pressure, but throttle disabled
    m2 = _patched(DeviceMonitor(enable_throttle=True, check_every=1), 0.97)
    assert m2.guard(1) is True          # pressure + enabled -> throttle


def test_guard_warns_per_episode(capsys):
    m = _patched(DeviceMonitor(enable_throttle=True, check_every=1), 0.97)
    m.guard(1)
    m.guard(2)
    out = capsys.readouterr().out
    assert out.count("[DEVICE]") == 1   # one warning per episode
    _patched(m, 0.5)
    assert m.guard(3) is False          # pressure gone -> reset
    _patched(m, 0.97)
    m.guard(4)
    assert "[DEVICE]" in capsys.readouterr().out  # new episode warns again


def test_guard_state_tristate():
    """None = not checked, True = pressure, False = checked-and-clear —
    the trainer uses False (not None) to restore a throttled eval tile."""
    m = _patched(DeviceMonitor(enable_throttle=True, check_every=10), 0.97)
    assert m.guard_state(1) is True
    assert m.guard_state(5) is None     # rate-limited -> unknown, no restore
    _patched(m, 0.5)
    assert m.guard_state(11) is False   # checked and clear -> restore signal
    m2 = _patched(DeviceMonitor(enable_throttle=False, check_every=1), 0.97)
    assert m2.guard_state(1) is True    # pressure reported even w/o throttle


def test_guard_respects_cadence():
    """Elapsed-steps rate limit: the trainer calls guard at LOG boundaries
    (50, 150, ...), which are rarely multiples of check_every — the first
    call must always check, later calls only after check_every steps."""
    m = _patched(DeviceMonitor(enable_throttle=True, check_every=20), 0.97)
    assert m.guard(7) is True           # first call always checks
    assert m.guard(15) is False         # only 8 steps elapsed
    assert m.guard(27) is True          # 20 elapsed since last check
    m2 = _patched(DeviceMonitor(enable_throttle=True, check_every=20), 0.97)
    assert m2.guard(50) is True         # --log_every 50 cadence works
    assert m2.guard(150) is True
