"""Equivalence tests: Pallas fused NeRF MLP vs the XLA oracle (interpret
mode on CPU; the same test runs compiled on TPU via bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params, nerf_apply
from nerf_sandbox_tpu.ops.fused_mlp import fusable, fused_nerf_apply

CFG = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=8, hidden_dim=256,
                 skip_pos=4)


def _data(q=300, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    ep = jax.random.normal(k1, (q, 63)) * 0.5
    ed = jax.random.normal(k2, (q, 27)) * 0.5
    return ep, ed


def test_fused_matches_xla_bf16():
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    ep, ed = _data()
    want = nerf_apply(params, CFG, ep, ed, compute_dtype=jnp.bfloat16)
    got = fused_nerf_apply(params, CFG, ep, ed, interpret=True)
    assert got.shape == (300, 4)
    # bf16 accumulation-order differences only
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)
    # tighter check vs fp32 oracle: bf16 rounding bound
    want32 = nerf_apply(params, CFG, ep, ed)
    err = np.abs(np.asarray(got) - np.asarray(want32))
    assert err.max() < 0.15, f"max err {err.max()}"


def test_fused_nontrivial_output():
    params = init_nerf_params(jax.random.PRNGKey(1), CFG)
    ep, ed = _data(seed=2)
    out = np.asarray(fused_nerf_apply(params, CFG, ep, ed, interpret=True))
    assert np.isfinite(out).all()
    assert out.std() > 1e-3


def test_fused_padding_edge():
    # Q not a multiple of the tile — padding must not corrupt real rows
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    ep, ed = _data(q=2049)
    out = fused_nerf_apply(params, CFG, ep, ed, interpret=True)
    out_small = fused_nerf_apply(params, CFG, ep[:100], ed[:100], interpret=True)
    np.testing.assert_allclose(np.asarray(out[:100]), np.asarray(out_small),
                               atol=1e-5)


def test_fusable_guard():
    assert fusable(CFG)
    assert not fusable(NeRFConfig(63, 27, hidden_dim=100))
    assert not fusable(NeRFConfig(63, 27, skip_pos=0))
    # no non-skip mid layers → the stacked-mids layout can't be built
    assert not fusable(NeRFConfig(24, 27, n_layers=2, hidden_dim=128,
                                  skip_pos=1))
