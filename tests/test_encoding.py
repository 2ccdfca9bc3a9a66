"""Parity + contract tests for positional encoding."""

import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.core.encoding import (
    encoder_out_dim, make_frequency_bands, positional_encoding, vanilla_encoders)


def test_out_dims():
    assert encoder_out_dim(3, 10, True) == 63
    assert encoder_out_dim(3, 4, True) == 27
    assert encoder_out_dim(3, 6, False) == 36


def test_parity_log_spaced(golden):
    x = jnp.asarray(golden["enc_x"])
    pos_bands, dir_bands = vanilla_encoders()
    got10 = positional_encoding(x, jnp.asarray(pos_bands), include_input=True)
    got4 = positional_encoding(x, jnp.asarray(dir_bands), include_input=True)
    np.testing.assert_allclose(np.asarray(got10), golden["enc_pos10"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got4), golden["enc_dir4"],
                               rtol=1e-5, atol=1e-6)


def test_parity_linear_two_pi(golden):
    x = jnp.asarray(golden["enc_x"])
    bands = make_frequency_bands(6, log_spaced=False, use_two_pi=True)
    got = positional_encoding(x, jnp.asarray(bands), include_input=False)
    # sin/cos of 2π-scaled args: fp32 argument rounding costs a few ulps
    np.testing.assert_allclose(np.asarray(got), golden["enc_lin6_2pi"],
                               rtol=1e-3, atol=5e-5)


def test_band_values():
    b = make_frequency_bands(4)
    np.testing.assert_allclose(b, [1.0, 2.0, 4.0, 8.0])
    b = make_frequency_bands(3, min_freq_log2=1, max_freq_log2=3)
    np.testing.assert_allclose(b, [2.0, 4.0, 8.0])


def test_scene_uncontract_roundtrip():
    """uncontract(contract(x)) == x for all finite x; contract(uncontract(c))
    == c inside the radius-2 ball; ||c|| >= 2 clamps to very-far world
    points instead of inf/nan."""
    from nerf_sandbox_tpu.core.encoding import scene_contract, scene_uncontract
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.concatenate([
        rng.uniform(-0.9, 0.9, (64, 3)),                 # inside unit ball
        rng.normal(0, 30.0, (64, 3)),                    # far content
    ]), jnp.float32)
    np.testing.assert_allclose(np.asarray(scene_uncontract(scene_contract(x))),
                               np.asarray(x), rtol=2e-3, atol=1e-5)
    c = jnp.asarray(rng.uniform(-1.9, 1.9, (128, 3)), jnp.float32)
    c = c * (jnp.linalg.norm(c, axis=-1, keepdims=True) < 1.99)
    np.testing.assert_allclose(np.asarray(scene_contract(scene_uncontract(c))),
                               np.asarray(c), rtol=1e-4, atol=1e-5)
    corner = jnp.asarray([[2.0, 2.0, 2.0], [-3.0, 0.0, 0.0]], jnp.float32)
    far = scene_uncontract(corner)
    assert np.all(np.isfinite(np.asarray(far)))
    assert float(jnp.linalg.norm(far, axis=-1).min()) > 1e4
