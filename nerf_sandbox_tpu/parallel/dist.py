"""Multi-process (multi-host) execution wiring.

Role: SURVEY.md §5 "distributed communication backend" at DCN scale — the
reference is single-process (no torch.distributed anywhere), so this layer
is TPU-native by design: one JAX process per host, ``jax.distributed``
coordination, a global mesh over every chip, and GSPMD/shard_map compute
exactly as in the single-process case.

Design:
* ``initialize_multihost`` wraps ``jax.distributed.initialize``.  On TPU
  pods every argument is auto-detected from the runtime; on CPU/GPU (and in
  the 2-process CPU tests) coordinator/process counts are passed explicitly
  and cross-process collectives run over Gloo.
* The ray pipeline needs NO per-host data loader sharding: batches are
  generated **inside** the jitted step from ``fold_in(seed, step)`` on the
  replicated scene arrays, so each host's devices materialise exactly their
  shard of the global batch — the per-host "feed my local slice" problem
  the reference's host-side sampler would have had disappears by
  construction.
* Replicated pytrees (params, opt state, scene arrays) become global arrays
  via ``device_put`` with a ``P()`` sharding — every process holds the full
  value, so its addressable shards are locally available.
* Artifact policy: checkpoints are written by process 0 only (restore
  assumes shared storage, the standard pod setup); validation renders run
  collectively on every process (a mesh-wide program must be dispatched
  everywhere) but non-main processes write under ``out_dir/procN`` to keep
  a shared filesystem race-free.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Call ``jax.distributed.initialize`` (idempotent).

    MUST run before the first backend touch (``jax.devices()`` etc).  With
    no arguments the TPU pod runtime auto-detects everything; explicit
    arguments serve CPU/GPU clusters and tests.  On CPU the cross-process
    collective implementation is switched to Gloo (XLA's default CPU
    backend has none).
    """
    try:
        # NOT jax.process_count(): that initialises the backend, defeating
        # the before-first-backend-touch contract this function exists for.
        from jax._src.distributed import global_state
        if global_state.client is not None:
            return  # already initialised
    except ImportError:
        pass  # private module moved: fall through, initialize() raises if dup
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # TPU-only jaxlib or renamed option; pods don't need it
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = str(coordinator_address)
    if num_processes is not None and int(num_processes) > 0:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None and int(process_id) >= 0:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    print(f"[dist] initialised: process {jax.process_index()} / "
          f"{jax.process_count()}, {jax.local_device_count()} local / "
          f"{jax.device_count()} global device(s)")


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def replicate_to_mesh(plan, tree):
    """Make every leaf a GLOBAL fully-replicated array on the plan's mesh.

    Required for jit inputs under multi-process SPMD (a host-local array
    cannot feed a computation spanning non-addressable devices).  Each
    process supplies its addressable shards from its full local copy —
    every process must therefore hold the SAME values (true for
    deterministically-initialised params and loaded scenes). No-op without
    a mesh.
    """
    if plan is None or plan.mesh is None:
        return tree
    s = NamedSharding(plan.mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate_outputs_constraint(plan, tree):
    """``with_sharding_constraint(P())`` on outputs that the host reads.

    Under multi-process SPMD a sharded output is only partially addressable
    per process; replicating (one all-gather over ICI/DCN) makes
    ``np.asarray`` legal everywhere. No-op single-process (outputs there
    are always fully addressable).
    """
    if plan is None or plan.mesh is None or jax.process_count() == 1:
        return tree
    s = NamedSharding(plan.mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, s), tree)
