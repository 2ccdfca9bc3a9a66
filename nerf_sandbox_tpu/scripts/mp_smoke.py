"""Multi-process training smoke driver.

Runs N deterministic train steps of a tiny vanilla-shaped model on the
GLOBAL device mesh and prints one JSON line of per-step losses.  Launched
once per process; the losses must be identical across processes AND match
a single-process run with the same global device count (the 2-process CPU
test, tests/test_multiprocess.py, and ``__graft_entry__.dryrun_multiprocess``
both assert this).

    python -m nerf_sandbox_tpu.scripts.mp_smoke \
        --coordinator_address localhost:12356 --num_processes 2 \
        --process_id 0 --steps 3

Role: SURVEY.md §5's DCN multi-slice execution path — the reference has no
distributed mode at all, so the contract here is self-imposed: multi-process
numerics == single-process numerics.
"""

from __future__ import annotations

import argparse
import json


def build_problem(shard_plan=None):
    """Deterministic tiny scene + hyper/spec (identical on every process).

    ``shard_plan``: build the image bank FRAME-SHARDED on that mesh and —
    proving the per-host data-loading contract — ZERO every frame this
    process does not own before building (the sharded gather must never
    read them, so the losses still match the replicated run exactly).
    """
    import jax.numpy as jnp
    import numpy as np

    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.data.scene import Frame, Scene
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import TrainHyper

    H = W = 8
    K = np.array([[8.0, 0, W / 2], [0, 8.0, H / 2], [0, 0, 1]], np.float32)
    rng = np.random.RandomState(0)
    frames = []
    for i in range(2):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0.1 * i, 0.0, 4.0]
        frames.append(Frame(image=rng.uniform(0, 1, (H, W, 3)).astype(np.float32),
                            K=K, c2w=c2w))
    if shard_plan is not None:
        from nerf_sandbox_tpu.parallel.mesh import owned_frame_rows
        owned = owned_frame_rows(shard_plan, len(frames))
        frames = [f if i in owned else
                  Frame(image=np.zeros_like(np.asarray(f.image)),
                        K=f.K, c2w=f.c2w)
                  for i, f in enumerate(frames)]
        scene = SceneArrays.from_scene_sharded(Scene(frames=frames),
                                               shard_plan)
    else:
        scene = SceneArrays.from_scene(Scene(frames=frames))
    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                       hidden_dim=32, skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=8, samp_near=2.0, samp_far=6.0)
    spec = RayBatchSpec(rays_per_batch=128, image_h=H, image_w=W,
                        shard_frames=shard_plan is not None)
    pos_b, dir_b = vanilla_encoders()
    return scene, hyper, spec, jnp.asarray(pos_b), jnp.asarray(dir_b)


def run_steps(steps: int = 3, devices=None, multiprocess: bool = False,
              shard_scene: bool = False):
    """Build the mesh over (global) devices, run ``steps`` train steps,
    return the per-step loss list."""
    import jax

    from nerf_sandbox_tpu.parallel.dist import replicate_to_mesh
    from nerf_sandbox_tpu.parallel.mesh import make_mesh
    from nerf_sandbox_tpu.train.step import (
        build_train_step, init_train_state, make_optimizer)

    plan = make_mesh(devices if devices is not None else jax.devices())
    scene, hyper, spec, pos_b, dir_b = build_problem(
        shard_plan=plan if shard_scene else None)
    tx = make_optimizer(5e-4, "cosine", {"T_max": 100, "eta_min": 5e-6})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=2.0, far=6.0)
    if multiprocess:
        state = replicate_to_mesh(plan, state)
        if not shard_scene:
            scene = replicate_to_mesh(plan, scene)
    step_fn = build_train_step(hyper, spec, tx, pos_b, dir_b, plan=plan,
                               base_seed=42)
    losses = []
    for _ in range(int(steps)):
        state, metrics = step_fn(state, scene)
        losses.append(float(metrics["loss"]))
    return losses


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("multi-process training smoke")
    ap.add_argument("--coordinator_address", default=None)
    ap.add_argument("--num_processes", type=int, default=0)
    ap.add_argument("--process_id", type=int, default=-1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--shard_scene", action="store_true",
                    help="frame-shard the image bank; each process zeroes "
                         "(never reads) frames it does not own")
    args = ap.parse_args(argv)

    import jax
    from nerf_sandbox_tpu.parallel.dist import initialize_multihost
    initialize_multihost(args.coordinator_address,
                         args.num_processes or None,
                         args.process_id if args.process_id >= 0 else None)
    # fp32 matmuls so losses are bit-comparable across runs (CPU oneDNN and
    # TPU both default to reduced precision)
    jax.config.update("jax_default_matmul_precision", "highest")
    losses = run_steps(args.steps, multiprocess=jax.process_count() > 1,
                       shard_scene=args.shard_scene)
    print(json.dumps({"process": jax.process_index(),
                      "n_processes": jax.process_count(),
                      "global_devices": jax.device_count(),
                      "losses": losses}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
