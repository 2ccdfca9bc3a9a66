"""NeRF MLP contract + tied-weight parity tests (mirrors reference
tests/unit/test_mlps.py intent, fixed for the raw-logit output contract)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.models.mlp import (
    NeRFConfig, init_nerf_params, nerf_apply, param_count,
    params_from_torch_state_dict, sigma_bias_for_initial_acc_opacity,
    trunk_in_dims)

CFG = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27)


def test_skip_layer_in_dims():
    dims = trunk_in_dims(CFG)
    assert dims == [63, 256, 256, 256, 256 + 63, 256, 256, 256]


def test_param_shapes_and_count(golden):
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    assert params["trunk"][4]["w"].shape == (319, 256)
    assert params["feature"]["w"].shape == (256, 256)
    assert params["sigma_out"]["w"].shape == (256, 1)
    assert params["color_fc"]["w"].shape == (256 + 27, 128)
    assert params["color_out"]["w"].shape == (128, 3)
    assert param_count(params) == int(golden["mlp_n_params"])


def test_tied_weight_forward_parity(golden):
    state_path = os.path.join(os.path.dirname(__file__), "golden", "mlp_state.npz")
    sd = dict(np.load(state_path))
    params = params_from_torch_state_dict(sd, CFG)
    out = nerf_apply(params, CFG,
                     jnp.asarray(golden["mlp_enc_pos"]),
                     jnp.asarray(golden["mlp_enc_dir"]))
    np.testing.assert_allclose(np.asarray(out), golden["mlp_out"],
                               rtol=1e-4, atol=1e-4)


def test_raw_output_contract():
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    out = nerf_apply(params, CFG, jnp.ones((4, 63)), jnp.ones((4, 27)))
    assert out.shape == (4, 4)
    # raw logits — values should NOT be sigmoid/relu-constrained in general
    assert np.isfinite(np.asarray(out)).all()


def test_grad_flow_to_all_params():
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)

    def loss(p):
        out = nerf_apply(p, CFG, jnp.ones((8, 63)) * 0.1, jnp.ones((8, 27)) * 0.1)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert float(jnp.abs(leaf).max()) > 0.0


def test_param_count_monotonic_in_width():
    small = init_nerf_params(jax.random.PRNGKey(0),
                             NeRFConfig(63, 27, hidden_dim=128))
    big = init_nerf_params(jax.random.PRNGKey(0),
                           NeRFConfig(63, 27, hidden_dim=256))
    assert param_count(big) > param_count(small)


def test_sigma_bias_init():
    # softplus(b) integrates to the requested opacity over [near, far]
    b = sigma_bias_for_initial_acc_opacity(0.5, near=2.0, far=6.0,
                                           activation="softplus")
    sigma_star = np.log1p(np.exp(b))
    acc = 1.0 - np.exp(-sigma_star * 4.0)
    assert abs(acc - 0.5) < 1e-5
    b_relu = sigma_bias_for_initial_acc_opacity(0.5, near=2.0, far=6.0,
                                                activation="relu")
    assert abs((1.0 - np.exp(-b_relu * 4.0)) - 0.5) < 1e-5

    params = init_nerf_params(jax.random.PRNGKey(0), CFG, near=2.0, far=6.0,
                              initial_acc_opacity=0.5,
                              sigma_activation="softplus")
    np.testing.assert_allclose(np.asarray(params["sigma_out"]["b"]), b, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["color_out"]["b"]), 0.0)
