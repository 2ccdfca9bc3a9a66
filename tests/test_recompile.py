"""jit-compile hygiene: the hot loop must compile exactly once
(SURVEY.md §4 — TPU-specific test the reference lacks)."""

import jax
import jax.numpy as jnp


def test_train_step_compiles_once():
    from tests.test_train_step import _setup
    state, step_fn, arrs = _setup()
    with jax.log_compiles(False):
        lowered = 0

        def count(*a, **k):
            nonlocal lowered
            lowered += 1

        for step in range(5):
            state, m = step_fn(state, arrs)
    # the jit cache holds exactly one specialization after 5 steps
    assert step_fn._cache_size() == 1


def test_sampler_precrop_transition_no_recompile():
    # the precrop→full-window transition is traced (jnp.where), so crossing
    # precrop_iters must not trigger a new compile
    import numpy as np
    from nerf_sandbox_tpu.data.sampler import (
        RayBatchSpec, SceneArrays, sample_ray_batch)
    from nerf_sandbox_tpu.data.scene import Frame, Scene

    K = np.array([[10.0, 0, 8], [0, 10.0, 8], [0, 0, 1]], np.float32)
    frames = [Frame(image=np.random.rand(16, 16, 3).astype(np.float32), K=K,
                    c2w=np.eye(4, dtype=np.float32))]
    arrs = SceneArrays.from_scene(Scene(frames=frames))
    spec = RayBatchSpec(rays_per_batch=32, image_h=16, image_w=16,
                        precrop_iters=5, precrop_frac=0.5)
    before = sample_ray_batch._cache_size()
    for step in [0, 4, 5, 6, 100]:
        sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(step), arrs, spec)
    assert sample_ray_batch._cache_size() == before + 1
