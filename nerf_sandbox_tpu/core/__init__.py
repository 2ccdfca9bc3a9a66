"""Pure, jittable geometry + numerics core.

Every function in this package is a stateless function of arrays — no
Python-side device logic, no host loops.  They are safe to call under
``jax.jit`` / ``shard_map`` and are the building blocks for the fused
Pallas kernels in ``nerf_sandbox_tpu.ops``.
"""

from nerf_sandbox_tpu.core.rays import RayBundle, get_camera_rays
from nerf_sandbox_tpu.core.encoding import positional_encoding, make_frequency_bands, encoder_out_dim
from nerf_sandbox_tpu.core.sampling import stratified_samples, perturb_z_samples, sample_pdf
from nerf_sandbox_tpu.core.integrator import volume_render_rays

__all__ = [
    "RayBundle",
    "get_camera_rays",
    "positional_encoding",
    "make_frequency_bands",
    "encoder_out_dim",
    "stratified_samples",
    "perturb_z_samples",
    "sample_pdf",
    "volume_render_rays",
]
