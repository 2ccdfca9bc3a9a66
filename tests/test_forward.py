"""End-to-end forward-pass parity (tied weights) vs the reference oracle."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.core.encoding import vanilla_encoders
from nerf_sandbox_tpu.models.forward import nerf_forward_pass
from nerf_sandbox_tpu.models.mlp import NeRFConfig, params_from_torch_state_dict

CFG = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27)


def _tied_params():
    state_path = os.path.join(os.path.dirname(__file__), "golden", "mlp_state.npz")
    return params_from_torch_state_dict(dict(np.load(state_path)), CFG)


def test_forward_pass_parity(golden):
    params = _tied_params()
    pos_bands, dir_bands = vanilla_encoders()
    comp, w, acc, depth = nerf_forward_pass(
        params, CFG,
        jnp.asarray(golden["fw_ro"]), jnp.asarray(golden["fw_rd"]),
        jnp.asarray(golden["fw_z"]),
        pos_bands=jnp.asarray(pos_bands), dir_bands=jnp.asarray(dir_bands),
        white_bkgd=True, ray_norms=jnp.asarray(golden["fw_rn"]),
        viewdirs_world_unit=jnp.asarray(golden["fw_vd"]),
        sigma_activation="relu", infinite_last_bin=True)
    np.testing.assert_allclose(np.asarray(comp), golden["fw_comp"], rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(w), golden["fw_w"], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(acc), golden["fw_acc"], rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(depth), golden["fw_depth"], rtol=1e-3, atol=1e-3)


def test_forward_pass_jits():
    params = _tied_params()
    pos_bands, dir_bands = vanilla_encoders()

    @jax.jit
    def f(p, ro, rd, z, rn, vd):
        return nerf_forward_pass(
            p, CFG, ro, rd, z, pos_bands=jnp.asarray(pos_bands),
            dir_bands=jnp.asarray(dir_bands), white_bkgd=True, ray_norms=rn,
            viewdirs_world_unit=vd, sigma_activation="relu",
            infinite_last_bin=True)

    B, N = 16, 32
    key = jax.random.PRNGKey(0)
    ro = jax.random.normal(key, (B, 3))
    rd = ro / jnp.linalg.norm(ro, axis=-1, keepdims=True)
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, N), (B, N))
    rn = jnp.ones((B, 1))
    comp, w, acc, depth = f(_tied_params(), ro, rd, z, rn, rd)
    assert comp.shape == (B, 3) and w.shape == (B, N)
    assert np.isfinite(np.asarray(comp)).all()


def test_sigma_noise_is_applied():
    params = _tied_params()
    pos_bands, dir_bands = vanilla_encoders()
    B, N = 8, 16
    ro = jnp.zeros((B, 3))
    rd = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (B, 3))
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, N), (B, N))
    kwargs = dict(pos_bands=jnp.asarray(pos_bands), dir_bands=jnp.asarray(dir_bands),
                  white_bkgd=False, ray_norms=jnp.ones((B, 1)),
                  viewdirs_world_unit=rd, sigma_activation="relu",
                  infinite_last_bin=True)
    c0, *_ = nerf_forward_pass(params, CFG, ro, rd, z, raw_noise_std=0.0, **kwargs)
    c1, *_ = nerf_forward_pass(params, CFG, ro, rd, z, raw_noise_std=1.0,
                               noise_key=jax.random.PRNGKey(3), **kwargs)
    assert float(jnp.abs(c0 - c1).max()) > 1e-6
