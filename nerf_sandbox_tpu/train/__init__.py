"""Training orchestration: jitted step, trainer shell, schedules, checkpoints."""
