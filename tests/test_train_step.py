"""Tests for the fused jitted train step, incl. mesh-sharded execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
from nerf_sandbox_tpu.data.scene import Frame, Scene
from nerf_sandbox_tpu.core.encoding import vanilla_encoders
from nerf_sandbox_tpu.models.mlp import NeRFConfig
from nerf_sandbox_tpu.parallel.mesh import make_mesh
from nerf_sandbox_tpu.train.step import (
    TrainHyper, build_train_step, init_train_state, make_lr_schedule,
    make_optimizer)


def _scene(n=3, H=16, W=16):
    rng = np.random.RandomState(0)
    K = np.array([[12.0, 0, W / 2], [0, 12.0, H / 2], [0, 0, 1]], np.float32)
    frames = []
    for i in range(n):
        img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
        c2w = np.eye(4, dtype=np.float32)
        th = i * 0.4
        c2w[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                                [-np.sin(th), 0, np.cos(th)]], np.float32)
        c2w[:3, 3] = c2w[:3, :3] @ np.array([0, 0, 4.0], np.float32)
        frames.append(Frame(image=img, K=K, c2w=c2w))
    return Scene(frames=frames, white_bkgd=True)


def _setup(batch=64, micro_chunks=0, mesh=None):
    scene = _scene()
    arrs = SceneArrays.from_scene(scene)
    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                       hidden_dim=64, skip_pos=1)
    hyper = TrainHyper(model=model, nc=16, nf=16, micro_chunks=micro_chunks,
                       samp_near=2.0, samp_far=6.0)
    spec = RayBatchSpec(rays_per_batch=batch, image_h=16, image_w=16)
    tx = make_optimizer(5e-4, "cosine", {"T_max": 100, "eta_min": 5e-6})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0, far=6.0)
    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b), plan=mesh)
    return state, step_fn, arrs


def test_loss_decreases_over_steps():
    state, step_fn, arrs = _setup()
    losses = []
    for _ in range(30):
        state, m = step_fn(state, arrs)
        losses.append(float(m["loss"]))
    assert int(state.step) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert all(np.isfinite(losses))


def test_micro_chunks_matches_full_batch_shape():
    state, step_fn, arrs = _setup(batch=64, micro_chunks=4)
    state, m = step_fn(state, arrs)
    assert np.isfinite(float(m["loss"]))
    assert bool(m["finite"])


def test_sharded_step_runs_on_mesh():
    plan = make_mesh()      # 8 virtual CPU devices from conftest
    assert plan.n_devices == 8
    state, step_fn, arrs = _setup(batch=128, mesh=plan)
    for _ in range(3):
        state, m = step_fn(state, arrs)
    assert np.isfinite(float(m["loss"]))
    # params remain replicated / usable
    assert int(state.step) == 3


def test_lr_schedule_matches_torch_cosine():
    sched = make_lr_schedule("cosine", 5e-4, {"T_max": 100, "eta_min": 5e-6})
    # torch CosineAnnealingLR: lr(k) for the (k+1)-th optimizer step
    for k in [0, 1, 50, 99, 100]:
        want = 5e-6 + (5e-4 - 5e-6) * (1 + np.cos(np.pi * min(k, 100) / 100)) / 2
        got = float(sched(k))
        # optax evaluates the cosine in fp32
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-8)


def test_deterministic_given_seed():
    s1, f1, arrs = _setup()
    s2, f2, _ = _setup()
    s1, m1 = f1(s1, arrs)
    s2, m2 = f2(s2, arrs)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_lr_grid_split_optimizer(tmp_path):
    """--lr_grid: pos_grid subtrees step at their own Adam lr; the
    multi_transform opt state survives a checkpoint round-trip."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nerf_sandbox_tpu.train.step import make_optimizer

    lr, glr = 1e-3, 1e-1
    tx = make_optimizer(lr, "none", {}, grid_lr=glr)
    params = {"c": {}, "f": {"w": jnp.ones((4, 4)),
                             "pos_grid": {"p0": jnp.ones((8, 2))}}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    # Adam's first-step update magnitude ~= its lr for a constant grad
    up_mlp = float(jnp.abs(updates["f"]["w"]).mean())
    up_grid = float(jnp.abs(updates["f"]["pos_grid"]["p0"]).mean())
    np.testing.assert_allclose(up_mlp, lr, rtol=0.05)
    np.testing.assert_allclose(up_grid, glr, rtol=0.05)

    # checkpoint round-trip of the multi_transform state
    from nerf_sandbox_tpu.train.checkpoints import (load_checkpoint,
                                                    save_checkpoint)
    from nerf_sandbox_tpu.train.step import TrainState
    st = TrainState(step=jnp.int32(3), params_c=params["c"],
                    params_f=params["f"], opt_state=state)
    p = save_checkpoint(tmp_path, 3, st, {"note": "t"})
    template = TrainState(step=jnp.int32(0), params_c=params["c"],
                          params_f=jax.tree_util.tree_map(jnp.zeros_like,
                                                          params["f"]),
                          opt_state=tx.init(params))
    st2, step, _ = load_checkpoint(p, template)
    assert step == 3
    l1 = jax.tree_util.tree_leaves(st.opt_state)
    l2 = jax.tree_util.tree_leaves(st2.opt_state)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
