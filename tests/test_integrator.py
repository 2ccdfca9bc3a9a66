"""Parity + invariant tests for the volume-rendering integrator."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.core.integrator import exclusive_cumprod, volume_render_rays


@pytest.mark.parametrize("ilb", [False, True])
@pytest.mark.parametrize("wb", [False, True])
def test_volume_render_parity(golden, ilb, wb):
    c, w, a, d = volume_render_rays(
        jnp.asarray(golden["vr_rgb"]), jnp.asarray(golden["vr_sigma"]),
        jnp.asarray(golden["vr_z"]), ray_norm=jnp.asarray(golden["vr_rn"]),
        white_bkgd=wb, infinite_last_bin=ilb)
    tag = f"vr_{int(ilb)}{int(wb)}"
    np.testing.assert_allclose(np.asarray(c), golden[f"{tag}_c"], rtol=1e-5, atol=1e-5)
    # near-zero deep-ray weights see cumprod rounding-order noise
    np.testing.assert_allclose(np.asarray(w), golden[f"{tag}_w"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), golden[f"{tag}_a"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), golden[f"{tag}_d"], rtol=1e-4, atol=1e-5)


def test_exclusive_cumprod():
    x = jnp.array([[2.0, 3.0, 4.0]])
    got = exclusive_cumprod(x)
    np.testing.assert_allclose(np.asarray(got), [[1.0, 2.0, 6.0]])


def test_weights_sum_matches_acc():
    # invariant checked by the reference's debug probe (debug_utils.py:150-152)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (8, 32, 3)).astype(np.float32))
    sigma = jnp.asarray(np.abs(rng.normal(0, 1, (8, 32))).astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(2, 6, (8, 32)).astype(np.float32), -1))
    c, w, a, d = volume_render_rays(rgb, sigma, z)
    np.testing.assert_allclose(np.asarray(w.sum(-1, keepdims=True)),
                               np.asarray(a), atol=1e-5)
    assert bool(jnp.all(a >= 0)) and bool(jnp.all(a <= 1))
    assert bool(jnp.all(c >= 0)) and bool(jnp.all(c <= 1))


def test_opaque_ray_hits_first_surface():
    # huge sigma at sample k → depth ≈ z_k, acc ≈ 1
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 64), (2, 64))
    sigma = jnp.zeros((2, 64)).at[:, 20].set(1e6)
    rgb = jnp.ones((2, 64, 3)) * 0.5
    c, w, a, d = volume_render_rays(rgb, sigma, z)
    np.testing.assert_allclose(np.asarray(d)[:, 0], np.asarray(z)[:, 20], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a), 1.0, atol=1e-4)
