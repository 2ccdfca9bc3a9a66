"""Host-side data layer: scene records, dataset loaders, ray-batch pipeline."""

from nerf_sandbox_tpu.data.scene import Frame, Scene
from nerf_sandbox_tpu.data.blender_loader import BlenderSceneLoader
from nerf_sandbox_tpu.data.llff_loader import LLFFSceneLoader
from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays, sample_ray_batch

__all__ = [
    "Frame", "Scene",
    "BlenderSceneLoader", "LLFFSceneLoader",
    "RayBatchSpec", "SceneArrays", "sample_ray_batch",
]
