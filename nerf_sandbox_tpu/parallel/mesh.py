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


def trunk_tp_specs(in_dims, out_dims, n_model: int) -> list:
    """Megatron pairing over a trunk: 'col' / 'row' / 'rep' per layer.

    Invariants the chain maintains (so GSPMD follows the INTENDED pattern
    instead of inventing reshards — verified by
    tests/test_sharding.py's ``inspect_array_sharding`` checks):

    * 'col' (W sharded on out) needs a REPLICATED input; its output is
      feature-sharded.
    * 'row' (W sharded on in) needs its input feature-sharded in the SAME
      layout — i.e. it must directly follow a 'col' of matching width; its
      matmul ends in the psum that re-replicates the activation.
    * a skip-concat layer (in_dim != previous out_dim) concatenates the
      replicated encoding — so the activation entering the concat must be
      replicated: any dangling 'col' before it is demoted to 'rep' and the
      pairing restarts.
    * the trunk must END replicated (heads are replicated): a trailing
      'col' is demoted to 'rep'.
    """
    specs: list = []
    phase = 0
    prev_out = None
    for in_d, out_d in zip(in_dims, out_dims):
        if prev_out is not None and in_d != prev_out:   # skip-concat layer
            if specs and specs[-1] == "col":
                specs[-1] = "rep"
            phase = 0
        if phase % 2 == 0:
            spec = "col" if out_d % n_model == 0 else "rep"
        else:
            spec = "row" if (in_d % n_model == 0
                             and specs[-1] == "col") else "rep"
        if spec == "rep":
            phase = 0
        else:
            phase += 1
        specs.append(spec)
        prev_out = out_d
    if specs and specs[-1] == "col":
        specs[-1] = "rep"
    return specs


def nerf_param_shardings(plan: MeshPlan, params):
    """Tensor-parallel shardings for a NeRF param pytree.

    * Trunk: Megatron col/row pairs (``trunk_tp_specs``) — the pairing
      restarts at the skip-concat layer and ends replicated, so the only
      model-axis collectives in the MLP are the one psum per row layer.
    * Factorized-grid tables (``pos_grid``: k-planes planes/lines): sharded
      on the FEATURE (last) axis over ``model`` — divides both the table
      HBM and the dominant 2·Q·R²·F contraction FLOPs per device; the
      encode keeps F sharded end-to-end (kplanes.py:_encode_chunk einsum
      forms) and the only collective is the all-gather of the small
      (Q, out_dim) feature vector at the encoder→MLP boundary.  Hash
      tables (L, 2^T, F) shard the same way when F divides the axis: the
      per-corner row gathers and the backward scatter-adds stay local to
      each device's F slice, so the family whose tables ARE the memory
      gets table-HBM /= model too; non-divisible F falls back replicated.
    * Heads / codes / pose deltas: replicated (tiny).
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
    trunk = params.get("trunk", ())
    specs = trunk_tp_specs([l["w"].shape[0] for l in trunk],
                           [l["w"].shape[1] for l in trunk], n_model)
    for i, spec in enumerate(specs):
        if spec == "col":
            out["trunk"][i] = {"w": col, "b": vec_col}
        elif spec == "row":
            out["trunk"][i] = {"w": row, "b": rep}
    if "pos_grid" in params:
        out["pos_grid"] = grid_param_shardings(plan, params["pos_grid"])
    return out


def grid_param_shardings(plan: MeshPlan, grid_params):
    """Feature-axis (last-dim) TP shardings for factorized-grid tables.

    k-planes planes (R,R,F) / time planes (R,T,F) → ``P(None,None,'model')``;
    CP lines (L,F) → ``P(None,'model')`` — whenever the feature dim divides
    the model axis; anything else (hash tables with tiny F, scalars) stays
    replicated.  See ``nerf_param_shardings`` for why the F axis."""
    if plan.mesh is None or "model" not in plan.mesh.axis_names:
        s = replicated_sharding(plan)
        return jax.tree_util.tree_map(lambda _: s, grid_params)
    mesh = plan.mesh
    n_model = mesh.shape["model"]
    rep = NamedSharding(mesh, P())

    def spec(x):
        if x.ndim >= 2 and x.shape[-1] % n_model == 0:
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), "model"))
        return rep

    return jax.tree_util.tree_map(spec, grid_params)


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
