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


def make_mesh_2d(n_data: int, n_model: int, devices=None,
                 axis_names=("data", "model")) -> MeshPlan:
    """2-D mesh: rays data-parallel on one axis, MLP tensor-parallel on the
    other.  TP is overkill for the 2.4M-param vanilla model but exercises
    the full sharding path for larger models (wide hidden dims / big hash
    tables); the inner axis should map to ICI."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_data * n_model, \
        f"need {n_data * n_model} devices, have {len(devices)}"
    arr = np.array(devices[:n_data * n_model]).reshape(n_data, n_model)
    return MeshPlan(mesh=Mesh(arr, axis_names))


def make_mesh_multihost(n_slices: int, chips_per_slice: int, devices=None,
                        axis_names=("dcn_data", "ici_data")) -> MeshPlan:
    """Hierarchical 2-D data mesh for multi-slice (multi-host) training.

    Both axes are data-parallel: the ray batch shards over their product
    (``P(('dcn_data', 'ici_data'))``).  The mesh's device array is laid out
    slice-major — axis 0 (``dcn_data``) strides across slices (DCN), axis 1
    (``ici_data``) walks the chips within one slice (ICI) — so XLA's
    all-reduce of the grad mean decomposes hierarchically: reduce within
    each slice over ICI first, then one small all-reduce of per-slice
    partials across DCN.  Nothing in the step function changes vs the 1-D
    mesh (the SURVEY §5 multi-slice note); params stay replicated.

    On real hardware pass ``jax.devices()`` (whose order is slice-major
    already under multi-slice jobs); tests reshape the virtual CPU devices
    the same way.
    """
    if devices is None:
        devices = jax.devices()
    n = n_slices * chips_per_slice
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(n_slices, chips_per_slice)
    return MeshPlan(mesh=Mesh(arr, axis_names))


def nerf_param_shardings(plan: MeshPlan, params):
    """Megatron-style alternating TP shardings for a NeRF param pytree.

    Trunk layer 2k: column-parallel (out dim over ``model``); layer 2k+1:
    row-parallel (in dim over ``model``) — XLA inserts the psum after each
    row-parallel matmul.  Heads and hash tables stay replicated (tiny).
    Returns a pytree of NamedSharding matching ``params``.
    """
    if plan.mesh is None or "model" not in plan.mesh.axis_names:
        s = replicated_sharding(plan)
        return jax.tree_util.tree_map(lambda _: s, params)

    mesh = plan.mesh
    col = NamedSharding(mesh, P(None, "model"))
    row = NamedSharding(mesh, P("model", None))
    vec_col = NamedSharding(mesh, P("model"))
    rep = NamedSharding(mesh, P())

    n_model = mesh.shape["model"]
    out = jax.tree_util.tree_map(lambda _: rep, params)
    for i, layer in enumerate(params["trunk"]):
        w = layer["w"]
        if i % 2 == 0 and w.shape[1] % n_model == 0:
            out["trunk"][i] = {"w": col, "b": vec_col}
        elif i % 2 == 1 and w.shape[0] % n_model == 0:
            # row-parallel input must itself be feature-sharded upstream;
            # the skip layer's concat input (hidden + enc) usually isn't
            # divisible — GSPMD reshards either way, this only tunes comms
            out["trunk"][i] = {"w": row, "b": rep}
    return out


def apply_param_shardings(plan: MeshPlan, params):
    """device_put the params onto their TP shardings (no-op off-mesh)."""
    if plan.mesh is None:
        return params
    shardings = nerf_param_shardings(plan, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)


def batch_sharding(plan: MeshPlan) -> Optional[NamedSharding]:
    """Axis-0 sharding of a batch over every data axis of the mesh.

    1-D mesh → ``P('data')``; 2-D data×model → ``P('data')`` (model axis
    untouched); multi-host 2-D data mesh → ``P(('dcn_data', 'ici_data'))``
    (batch over the product of both data axes)."""
    if plan.mesh is None:
        return None
    data_axes = tuple(a for a in plan.mesh.axis_names if a != "model")
    return NamedSharding(plan.mesh, P(data_axes))


def owned_frame_rows(plan: MeshPlan, n_frames: int) -> set:
    """Frame indices this PROCESS's devices own under the frame-sharded
    scene bank (``SceneArrays.from_scene_sharded``'s axis-0 layout, frames
    zero-padded to an equal split over the data axes).  Drives the loaders'
    ``image_filter`` so each host only decodes its own frames."""
    mesh = plan.mesh
    if mesh is None:
        return set(range(n_frames))
    data_axes = tuple(a for a in mesh.axis_names if a != "model")
    D = int(np.prod([mesh.shape[a] for a in data_axes]))
    per = -(-n_frames // D)
    sh = NamedSharding(mesh, P(data_axes, None, None, None))
    me = jax.process_index()
    owned: set = set()
    for dev, idx in sh.devices_indices_map((D * per, 1, 1, 1)).items():
        if dev.process_index == me:
            sl = idx[0]
            owned.update(range(sl.start or 0, min(sl.stop or D * per, n_frames)))
    return owned


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
