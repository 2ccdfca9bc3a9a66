"""Device mesh + sharding layout for NeRF training.

Design (replaces the reference's absent distributed layer, SURVEY.md §5):

* one mesh axis ``data`` over all chips (rays are embarrassingly parallel —
  no cross-device exchange in the hot loop; the per-ray sample dimension
  stays on-chip)
* ray batches / pixel buffers: sharded on axis 0 (``P('data')``)
* params, optimizer state, scene arrays (images/Ks/c2ws): replicated
* gradients: mean over the global batch → XLA inserts the ``psum`` over ICI
  automatically when the loss reduces a sharded batch under ``jit``
* eval: image tiles sharded the same way; the host reassembles PNGs.

Multi-slice note: with a 2-D mesh (``data`` inner on ICI, an outer axis on
DCN) the same ``P('data')`` layout keeps the only collective (grad psum)
hierarchical; nothing in the step function changes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MeshPlan(NamedTuple):
    mesh: Optional[Mesh]

    @property
    def n_devices(self) -> int:
        return 1 if self.mesh is None else self.mesh.size


def make_mesh(devices=None, *, axis_name: str = "data") -> MeshPlan:
    """Build a 1-D data mesh over the given (or all) devices.

    A single device → ``MeshPlan(mesh=None)``: the step functions skip
    sharding constraints entirely, keeping the one-chip program trivial.
    """
    if devices is None:
        devices = jax.devices()
    if len(devices) <= 1:
        return MeshPlan(mesh=None)
    return MeshPlan(mesh=Mesh(np.array(devices), (axis_name,)))


def batch_sharding(plan: MeshPlan) -> Optional[NamedSharding]:
    if plan.mesh is None:
        return None
    return NamedSharding(plan.mesh, P("data"))


def replicated_sharding(plan: MeshPlan) -> Optional[NamedSharding]:
    if plan.mesh is None:
        return None
    return NamedSharding(plan.mesh, P())


def shard_batch_constraint(plan: MeshPlan, tree):
    """Constrain every array in ``tree`` to be sharded on axis 0 over ``data``.

    No-op on a single device. Applied to the freshly-sampled ray batch inside
    the jitted train step so the coarse/fine MLP evals partition across chips.
    """
    s = batch_sharding(plan)
    if s is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, s), tree)
