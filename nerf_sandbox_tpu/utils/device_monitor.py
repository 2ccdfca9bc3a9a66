"""Device health monitor (the TPU-side replacement for the GPU thermal guard).

Role parity: ``nerf_sandbox/source/utils/gpu_thermal.py:29-90``
(``GpuThermalManager``) — the reference polls pynvml for laptop-GPU
temperature and can raise micro-chunking / sleep when hot.  TPU pods are
datacenter-managed, so there is nothing to throttle; what IS useful on TPU
is memory-pressure telemetry.  This monitor keeps the same interface shape
(``guard()`` + ``log_to_tb``) and reports per-device HBM usage from
``jax.local_devices()[i].memory_stats()`` instead of a temperature.
"""

from __future__ import annotations

from typing import Optional

import jax


class DeviceMonitor:
    def __init__(self, enable_throttle: bool = False, check_every: int = 20,
                 **_legacy_thermal_knobs) -> None:
        # legacy thermal knobs (gpu_temp_threshold, cooldown, ...) accepted
        # and ignored — TPUs need no thermal guard.
        self.enable_throttle = bool(enable_throttle)
        self.check_every = max(1, int(check_every))
        self._warned = False
        self._last_checked = None

    def hbm_stats(self) -> Optional[dict]:
        try:
            dev = jax.local_devices()[0]
            stats = dev.memory_stats()
            if not stats:
                return None
            return {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
        except Exception:
            return None

    def guard_state(self, step: int) -> Optional[bool]:
        """Per-step hook (reference ``gpu_thermal.py:69-90`` role).

        Tri-state: ``None`` = not checked (rate-limited / stats unavailable),
        ``True`` = under memory pressure (>95% HBM), ``False`` = checked and
        clear.  The trainer halves the validation eval tile on pressure and
        restores it once the pressure clears (a one-way ratchet would leave
        a transient validation-render spike permanently shrinking the tile).
        Warns on each new pressure episode.

        Rate limiting is elapsed-steps based (NOT ``step % check_every`` —
        the trainer calls this at log boundaries, which are rarely exact
        multiples of check_every)."""
        if (self._last_checked is not None
                and step - self._last_checked < self.check_every):
            return None
        self._last_checked = step
        s = self.hbm_stats()
        if not (s and s["bytes_limit"]):
            return None
        frac = s["bytes_in_use"] / s["bytes_limit"]
        if frac <= 0.95:
            self._warned = False
            return False
        if not self._warned:
            print(f"[DEVICE] HBM {frac*100:.1f}% full "
                  f"({s['bytes_in_use']/2**30:.2f} GiB)"
                  + (" — halving validation eval tile" if self.enable_throttle
                     else " — consider --micro_chunks, a smaller "
                          "--eval_chunk, or --thermal_throttle"))
            self._warned = True
        return True

    def guard(self, step: int) -> bool:
        """Legacy boolean hook: True = pressure AND throttling enabled."""
        return bool(self.guard_state(step)) and self.enable_throttle

    def log_to_tb(self, tb_logger, step: int) -> None:
        s = self.hbm_stats()
        if s is None:
            return
        tb_logger.add_scalar("sys/hbm_bytes_in_use", s["bytes_in_use"], step)
        if s["bytes_limit"]:
            tb_logger.add_scalar("sys/hbm_utilisation",
                                 s["bytes_in_use"] / s["bytes_limit"], step)
