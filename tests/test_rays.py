"""Parity tests for camera-ray generation vs the PyTorch reference oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.core.rays import get_camera_rays, get_camera_rays_grid, pixel_grid

FIELDS = ["o_world", "d_world_unit", "d_world_norm",
          "o_march", "d_march_unit", "d_march_norm"]


@pytest.mark.parametrize("conv", ["opengl", "opencv", "pytorch3d"])
def test_world_ray_parity(golden, conv):
    K, c2w, px = golden["rays_K"], golden["rays_c2w"], golden["rays_pixels"]
    H, W = int(golden["rays_H"]), int(golden["rays_W"])
    r = get_camera_rays(jnp.asarray(K), jnp.asarray(c2w), jnp.asarray(px),
                        image_h=H, image_w=W, convention=conv,
                        pixel_center=True, as_ndc=False)
    for name, got in zip(FIELDS, r):
        want = golden[f"rays_{conv}_{name}"]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"{conv}/{name}")


def test_ndc_ray_parity(golden):
    K, c2w, px = golden["rays_K"], golden["rays_ndc_c2w"], golden["rays_pixels"]
    H, W = int(golden["rays_H"]), int(golden["rays_W"])
    r = get_camera_rays(jnp.asarray(K), jnp.asarray(c2w), jnp.asarray(px),
                        image_h=H, image_w=W, convention="opengl",
                        pixel_center=True, as_ndc=True, near_plane=1.0)
    for name, got in zip(FIELDS, r):
        want = golden[f"rays_ndc_{name}"]
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5,
                                   err_msg=f"ndc/{name}")


def test_pixel_grid_order():
    px = np.asarray(pixel_grid(2, 3))
    # row-major, y-first: (x, y) pairs
    want = np.array([[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1]], np.float32)
    np.testing.assert_array_equal(px, want)


def test_grid_matches_explicit_pixels(golden):
    K, c2w = golden["rays_K"], golden["rays_c2w"]
    H, W = 4, 5
    r1 = get_camera_rays_grid(jnp.asarray(K), jnp.asarray(c2w), image_h=H,
                              image_w=W, convention="opengl", pixel_center=True)
    px = pixel_grid(H, W)
    r2 = get_camera_rays(jnp.asarray(K), jnp.asarray(c2w), px, image_h=H,
                         image_w=W, convention="opengl", pixel_center=True)
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unit_norms():
    K = jnp.array([[20.0, 0, 8], [0, 20.0, 6], [0, 0, 1]])
    c2w = jnp.eye(4)
    r = get_camera_rays_grid(K, c2w, image_h=12, image_w=16, convention="opengl")
    n = jnp.linalg.norm(r.d_world_unit, axis=-1)
    np.testing.assert_allclose(np.asarray(n), 1.0, atol=1e-5)
    # origins == camera center
    np.testing.assert_allclose(np.asarray(r.o_world), 0.0, atol=1e-7)
