"""Aux services: TensorBoard logging, signals, device monitor, debug dumps."""
