"""Tests for the pure-JAX ray-batch sampler (role parity with the reference's
tests/unit/test_ray_sampler.py, updated to the 7-key batch schema +
per-ray IPE radii)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays, sample_ray_batch
from nerf_sandbox_tpu.data.scene import Frame, Scene

BATCH_KEYS = {"rgb", "rays_o_world", "rays_d_world_unit", "rays_d_world_norm",
              "rays_o_marching", "rays_d_marching_unit", "rays_d_marching_norm",
              "radii", "frame_ids", "t"}


def _tiny_scene(n=3, H=8, W=8, rgba=False):
    rng = np.random.RandomState(0)
    frames = []
    K = np.array([[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]], np.float32)
    for i in range(n):
        c = 4 if rgba else 3
        img = rng.uniform(0, 1, (H, W, c)).astype(np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [i, 0, 4.0]
        frames.append(Frame(image=img, K=K, c2w=c2w))
    return Scene(frames=frames, white_bkgd=True)


def _spec(scene, **kw):
    defaults = dict(rays_per_batch=64, image_h=scene.H, image_w=scene.W)
    defaults.update(kw)
    return RayBatchSpec(**defaults)


def test_batch_schema_and_shapes():
    scene = _tiny_scene()
    arrs = SceneArrays.from_scene(scene)
    spec = _spec(scene)
    batch = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(0), arrs, spec)
    assert set(batch.keys()) == BATCH_KEYS
    B = spec.rays_per_batch
    assert batch["rgb"].shape == (B, 3)
    assert batch["rays_o_world"].shape == (B, 3)
    assert batch["rays_d_world_norm"].shape == (B, 1)
    assert batch["radii"].shape == (B,)
    assert batch["frame_ids"].shape == (B,)
    assert batch["frame_ids"].dtype == jnp.int32
    assert batch["t"].shape == (B,)
    np.testing.assert_array_equal(np.asarray(batch["t"]), 0.0)  # static
    # radii = (2/sqrt(12))/fx / ||d||: positive, pixel-scale
    r = np.asarray(batch["radii"]) * np.asarray(batch["rays_d_world_norm"])[:, 0]
    np.testing.assert_allclose(r, 2 / np.sqrt(12) / 10.0, rtol=1e-5)
    n = jnp.linalg.norm(batch["rays_d_world_unit"], axis=-1)
    np.testing.assert_allclose(np.asarray(n), 1.0, atol=1e-5)


def test_rgba_white_compositing():
    scene = _tiny_scene(rgba=True)
    arrs = SceneArrays.from_scene(scene)
    batch = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(0), arrs,
                             _spec(scene, white_bkgd=True))
    # fully transparent pixels → white; verify via a constructed scene
    img = np.zeros((8, 8, 4), np.float32)  # alpha=0 everywhere
    sc2 = Scene(frames=[Frame(image=img, K=scene.frames[0].K,
                              c2w=scene.frames[0].c2w)], white_bkgd=True)
    b2 = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(0),
                          SceneArrays.from_scene(sc2), _spec(sc2))
    np.testing.assert_allclose(np.asarray(b2["rgb"]), 1.0, atol=1e-6)


def test_single_frame_mode_uses_one_camera():
    scene = _tiny_scene(n=4)
    arrs = SceneArrays.from_scene(scene)
    batch = sample_ray_batch(jax.random.PRNGKey(1), jnp.int32(0), arrs,
                             _spec(scene, single_frame=True))
    # all origins identical in x (frames differ by x translation)
    ox = np.asarray(batch["rays_o_world"][:, 0])
    assert np.unique(ox).size == 1


def test_mixed_frame_mode_mixes_cameras():
    scene = _tiny_scene(n=4)
    arrs = SceneArrays.from_scene(scene)
    batch = sample_ray_batch(jax.random.PRNGKey(1), jnp.int32(0), arrs,
                             _spec(scene, single_frame=False, rays_per_batch=256))
    ox = np.asarray(batch["rays_o_world"][:, 0])
    assert np.unique(ox).size > 1


def test_precrop_restricts_pixels():
    scene = _tiny_scene(n=1, H=16, W=16)
    arrs = SceneArrays.from_scene(scene)
    spec = _spec(scene, precrop_iters=10, precrop_frac=0.5, rays_per_batch=512)
    # during precrop: ray dirs limited to the central window → origins same,
    # check pixel extremes via the gathered rgb vs a direct reconstruction
    b_in = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(0), arrs, spec)
    b_out = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(100), arrs, spec)
    # x_cam spread should be wider after precrop ends
    def spread(b):
        d = np.asarray(b["rays_d_world_unit"])
        return d[:, 0].max() - d[:, 0].min()
    assert spread(b_out) > spread(b_in) * 1.5


def test_stream_varies_with_key():
    scene = _tiny_scene()
    arrs = SceneArrays.from_scene(scene)
    spec = _spec(scene)
    b1 = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(0), arrs, spec)
    b2 = sample_ray_batch(jax.random.PRNGKey(1), jnp.int32(0), arrs, spec)
    assert float(jnp.abs(b1["rgb"] - b2["rgb"]).max()) > 0


def test_origins_match_camera_centers():
    scene = _tiny_scene(n=2)
    arrs = SceneArrays.from_scene(scene)
    batch = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(0), arrs,
                             _spec(scene, single_frame=False))
    o = np.asarray(batch["rays_o_world"])
    centers = {0.0, 1.0}
    assert set(np.unique(o[:, 0]).tolist()) <= centers
    np.testing.assert_allclose(o[:, 2], 4.0)


def test_ndc_marching_differs_from_world():
    scene = _tiny_scene(n=1)
    arrs = SceneArrays.from_scene(scene)
    batch = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(0), arrs,
                             _spec(scene, as_ndc=True, near_plane=1.0))
    assert float(jnp.abs(batch["rays_o_marching"] - batch["rays_o_world"]).max()) > 1e-3
    rn = np.asarray(batch["rays_d_marching_norm"])
    assert np.isfinite(rn).all() and (rn > 0).all()


def test_precrop_boundary_inclusive():
    """The 1-based step == precrop_iters is still cropped (the reference
    crops precrop_iters batches with its 0-based counter, ADVICE r1);
    step == precrop_iters + 1 uses the full window."""
    scene = _tiny_scene(n=1, H=16, W=16)
    arrs = SceneArrays.from_scene(scene)
    spec = _spec(scene, precrop_iters=10, precrop_frac=0.5, rays_per_batch=512)

    def spread(b):
        d = np.asarray(b["rays_d_world_unit"])
        return d[:, 0].max() - d[:, 0].min()

    b_at = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(10), arrs, spec)
    b_after = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(11), arrs, spec)
    assert spread(b_after) > spread(b_at) * 1.5
