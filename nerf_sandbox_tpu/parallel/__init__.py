"""Mesh parallelism: device meshes, shardings, collective layout.

The reference is strictly single-process/single-device (SURVEY.md §2 #27/#28);
this package supplies the TPU-native scaling story: a ``data`` mesh axis over
which the ray batch is sharded (rays are i.i.d.), params replicated, gradient
reduction via XLA-inserted ``psum`` under ``jit``.
"""

from nerf_sandbox_tpu.parallel.mesh import (
    MeshPlan, make_mesh, batch_sharding, replicated_sharding, shard_batch_constraint)

__all__ = [
    "MeshPlan", "make_mesh", "batch_sharding", "replicated_sharding",
    "shard_batch_constraint",
]
