"""NeRF model family: pytree-parameterised MLPs + encoders."""

from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params, nerf_apply, param_count
from nerf_sandbox_tpu.models.forward import nerf_forward_pass

__all__ = [
    "NeRFConfig",
    "init_nerf_params",
    "nerf_apply",
    "param_count",
    "nerf_forward_pass",
]
