"""Parity + contract tests for stratified and inverse-CDF sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.core.sampling import (
    merge_z_samples, perturb_z_samples, sample_pdf, stratified_samples)


def test_sample_pdf_det_parity_midpoints(golden):
    z = sample_pdf(jnp.asarray(golden["pdf_mids"]),
                   jnp.asarray(golden["pdf_weights"]), 128, deterministic=True)
    np.testing.assert_allclose(np.asarray(z), golden["pdf_z_det"],
                               rtol=1e-5, atol=1e-5)


def test_sample_pdf_det_parity_edges(golden):
    z = sample_pdf(jnp.asarray(golden["pdf_edges"]),
                   jnp.asarray(golden["pdf_weights"]), 128, deterministic=True)
    np.testing.assert_allclose(np.asarray(z), golden["pdf_z_det_edges"],
                               rtol=1e-5, atol=1e-5)


def test_sample_pdf_stochastic_in_range():
    key = jax.random.PRNGKey(0)
    B, M = 8, 63
    mids = jnp.sort(jax.random.uniform(key, (B, M), minval=2.0, maxval=6.0), axis=-1)
    w = jax.random.uniform(jax.random.PRNGKey(1), (B, M))
    z = sample_pdf(mids, w, 64, key=jax.random.PRNGKey(2))
    assert z.shape == (B, 64)
    # samples must lie within the expanded edge range
    lo = mids[:, :1] - 0.5 * (mids[:, 1:2] - mids[:, :1])
    hi = mids[:, -1:] + 0.5 * (mids[:, -1:] - mids[:, -2:-1])
    assert bool(jnp.all(z >= lo - 1e-5)) and bool(jnp.all(z <= hi + 1e-5))


def test_sample_pdf_concentrates_mass():
    # All weight in one bin → nearly all samples land there.
    B, M = 4, 32
    mids = jnp.broadcast_to(jnp.linspace(0.0, 1.0, M), (B, M))
    w = jnp.zeros((B, M)).at[:, 10].set(100.0)
    z = sample_pdf(mids, w, 256, key=jax.random.PRNGKey(0))
    center = mids[0, 10]
    frac_near = jnp.mean((jnp.abs(z - center) < 0.05).astype(jnp.float32))
    assert float(frac_near) > 0.9


def test_stratified_and_perturb():
    z = stratified_samples(2.0, 6.0, 64)
    assert z.shape == (64,)
    assert float(z[0]) == 2.0 and abs(float(z[-1]) - 6.0) < 1e-6
    zb = jnp.broadcast_to(z, (16, 64))
    zp = perturb_z_samples(jax.random.PRNGKey(0), zb)
    # monotone without an explicit sort, within [near, far]
    assert bool(jnp.all(zp[..., 1:] >= zp[..., :-1]))
    assert bool(jnp.all(zp >= 2.0)) and bool(jnp.all(zp <= 6.0))
    # actually jittered
    assert float(jnp.abs(zp - zb).max()) > 1e-4


def test_merge_sorted():
    zc = jnp.broadcast_to(jnp.linspace(0, 1, 8), (4, 8))
    zf = jax.random.uniform(jax.random.PRNGKey(0), (4, 16))
    zm = merge_z_samples(zc, zf)
    assert zm.shape == (4, 24)
    assert bool(jnp.all(zm[..., 1:] >= zm[..., :-1]))
