"""Signal handling for graceful interrupt / pause / render-cancel.

Parity target: ``nerf_sandbox/source/utils/signal_handlers.py:1-39`` +
trainer wiring (trainer.py:740-752):

* SIGINT  → save ``interrupt_step_N`` checkpoint, break the loop, skip
  post-training exports
* SIGUSR1 → save ``pause_step_N`` checkpoint mid-run, keep training
* SIGUSR2 → set ``cancel_render`` (consumed by video export loops)
* Windows-safe install (USR signals may be missing).
"""

from __future__ import annotations

import signal
from dataclasses import dataclass


@dataclass
class SignalController:
    sigint: bool = False
    sigusr1: bool = False
    cancel_render: bool = False


def install_signal_handlers(ctl: SignalController) -> None:
    def on_int(signum, frame):
        ctl.sigint = True
        print("[SIGNAL] SIGINT received — will checkpoint and exit.")

    def on_usr1(signum, frame):
        ctl.sigusr1 = True
        print("[SIGNAL] SIGUSR1 received — will save a pause checkpoint.")

    def on_usr2(signum, frame):
        ctl.cancel_render = True
        print("[SIGNAL] SIGUSR2 received — cancelling current render export.")

    signal.signal(signal.SIGINT, on_int)
    for name, handler in [("SIGUSR1", on_usr1), ("SIGUSR2", on_usr2)]:
        sig = getattr(signal, name, None)
        if sig is not None:
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass
