"""K-planes factorized encoder (models/kplanes.py) — the TPU-fast encoder
family (role parity: the Instant-NGP slot of BASELINE config #5; the
reference has no counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.models.kplanes import (
    KPlanesConfig, init_kplanes_params, kplanes_encode)

CFG = KPlanesConfig(plane_res=(8, 16), plane_features=4, line_res=32,
                    line_features=6, aabb_scale=1.0, chunk=64)


def test_shapes_and_out_dim():
    params = init_kplanes_params(jax.random.PRNGKey(0), CFG)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (50, 3),
                             minval=-1.0, maxval=1.0)
    out = kplanes_encode(params, pts, CFG)
    assert out.shape == (50, CFG.out_dim)
    assert CFG.out_dim == 2 * 4 + 6
    assert bool(jnp.all(jnp.isfinite(out)))


def test_grid_node_exactness():
    """At an exact grid node the bilinear weights are one-hot, so the
    encoding equals the product of the three plane node features."""
    cfg = KPlanesConfig(plane_res=(8,), plane_features=3, line_res=8,
                        line_features=2, aabb_scale=1.0, chunk=64)
    params = init_kplanes_params(jax.random.PRNGKey(0), cfg)
    R = 8
    ix, iy, iz = 2, 5, 3
    # node (ix,iy,iz) in [0,1]^3 → world coords in [-1,1]
    x01 = np.array([ix, iy, iz], np.float32) / (R - 1)
    pt = (x01 - 0.5) * 2.0
    out = np.asarray(kplanes_encode(params, jnp.asarray(pt)[None], cfg,
                                    compute_dtype=jnp.float32))[0]
    expect = (np.asarray(params["plane0_xy"])[ix, iy]
              * np.asarray(params["plane0_xz"])[ix, iz]
              * np.asarray(params["plane0_yz"])[iy, iz])
    np.testing.assert_allclose(out[:3], expect, rtol=1e-5)


def test_chunked_matches_direct():
    params = init_kplanes_params(jax.random.PRNGKey(0), CFG)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (150, 3),
                             minval=-1.0, maxval=1.0)   # 150 > chunk=64
    out_chunked = kplanes_encode(params, pts, CFG, compute_dtype=jnp.float32)
    direct = jnp.concatenate(
        [kplanes_encode(params, pts[i:i + 50], CFG,
                        compute_dtype=jnp.float32) for i in (0, 50, 100)])
    np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(direct),
                               atol=1e-5)


def test_gradients_reach_every_plane_and_line():
    params = init_kplanes_params(jax.random.PRNGKey(0), CFG)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                             minval=-0.9, maxval=0.9)

    def loss(p):
        return (kplanes_encode(p, pts, CFG) ** 2).sum()

    g = jax.grad(loss)(params)
    for k, v in g.items():
        assert float(jnp.abs(v).max()) > 0.0, f"no gradient reached {k}"


def test_cli_train_smoke(tmp_path):
    """--encoder kplanes end-to-end: train, validate, checkpoint, resume."""
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    root = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    argv = ["--data_root", str(root), "--out_dir", str(out),
            "--data_kind", "blender", "--max_steps", "6",
            "--rays_per_batch", "32", "--nc", "4", "--nf", "4",
            "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
            "--encoder", "kplanes", "--kp_plane_res", "8,16",
            "--kp_plane_features", "4", "--kp_line_res", "32",
            "--kp_line_features", "4",
            "--num_val_steps", "1", "--ckpt_every", "6", "--log_every", "3",
            "--eval_chunk", "64"]
    main(argv)
    assert (out / "checkpoints" / "ckpt_0000006.ckpt").exists()
    main(argv[: argv.index("--max_steps") + 1] + ["8"]
         + argv[argv.index("--max_steps") + 2:] + ["--resume", "latest"])
