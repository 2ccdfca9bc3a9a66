"""Pallas TPU kernels for the hot compute path (XLA fallbacks included)."""

from nerf_sandbox_tpu.ops.fused_mlp import (
    fused_nerf_apply, pack_nerf_params, pallas_available)

__all__ = ["fused_nerf_apply", "pack_nerf_params", "pallas_available"]
