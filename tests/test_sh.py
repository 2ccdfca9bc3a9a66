"""Spherical-harmonics view-direction encoder (beyond-reference).

The torch reference has only the frequency encoder (encoders.py:6-106);
``--dir_enc sh`` adds the Instant-NGP-standard real-SH basis. Contracts:
orthonormality of the basis on S² (Monte-Carlo — this pins every constant
in core/encoding.py:sh_encoding), rotation-equivariant smoothness sanity,
and framework integration (train step + eval renderer + occupancy probe
all run with the 16-dim dir encoding; --dir_enc freq is bit-unchanged).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.core.encoding import (encode_dirs, make_frequency_bands,
                                            positional_encoding, sh_encoding,
                                            vanilla_encoders)


def _unit_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3))
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


@pytest.mark.parametrize("degree,dim", [(1, 1), (2, 4), (3, 9), (4, 16)])
def test_sh_output_dim(degree, dim):
    d = jnp.asarray(_unit_dirs(8), jnp.float32)
    assert sh_encoding(d, degree=degree).shape == (8, dim)


def test_sh_orthonormality_monte_carlo():
    """∫_{S²} Y_i Y_j dΩ = δ_ij  ⇒  4π·E[Y_i Y_j] = δ_ij under uniform
    sphere sampling — pins every constant of the real-SH basis."""
    d = jnp.asarray(_unit_dirs(400_000, seed=1), jnp.float32)
    Y = np.asarray(sh_encoding(d, degree=4), np.float64)       # (N, 16)
    gram = 4 * np.pi * (Y.T @ Y) / Y.shape[0]
    np.testing.assert_allclose(gram, np.eye(16), atol=0.02)


def test_sh_prefix_consistency():
    """Lower degrees are exact prefixes of higher ones (basis ordering)."""
    d = jnp.asarray(_unit_dirs(32, seed=2), jnp.float32)
    full = np.asarray(sh_encoding(d, degree=4))
    for deg, dim in [(1, 1), (2, 4), (3, 9)]:
        np.testing.assert_array_equal(np.asarray(sh_encoding(d, degree=deg)),
                                      full[:, :dim])


def test_encode_dirs_switch():
    d = jnp.asarray(_unit_dirs(16, seed=3), jnp.float32)
    bands = jnp.asarray(make_frequency_bands(4))
    np.testing.assert_array_equal(
        np.asarray(encode_dirs(d, bands, dir_encoder="freq")),
        np.asarray(positional_encoding(d, bands, include_input=True)))
    np.testing.assert_array_equal(
        np.asarray(encode_dirs(d, bands, dir_encoder="sh", sh_degree=3)),
        np.asarray(sh_encoding(d, degree=3)))


def test_sh_train_step_runs_and_learns():
    from tests.test_appearance import _gain_scene  # reuse the scene harness
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (TrainHyper, build_train_step,
                                             init_train_state, make_optimizer)
    scene = _gain_scene([1.0, 1.0, 1.0])
    arrs = SceneArrays.from_scene(scene)
    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=16, n_layers=2,
                       hidden_dim=32, skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=8, samp_near=2.0, samp_far=6.0,
                       raw_noise_std=0.0, dir_encoder="sh", sh_degree=4)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    tx = make_optimizer(5e-3, "none", {})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=2.0, far=6.0)
    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b))
    losses = []
    for _ in range(40):
        state, m = step_fn(state, arrs)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_sh_eval_renderer_runs():
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    from nerf_sandbox_tpu.render.renderer import (EvalHyper,
                                                  make_tile_renderer,
                                                  render_pose)
    model = NeRFConfig(63, 16, n_layers=2, hidden_dim=32, skip_pos=1)
    pos_b, dir_b = vanilla_encoders()
    pc = init_nerf_params(jax.random.PRNGKey(0), model)
    pf = init_nerf_params(jax.random.PRNGKey(1), model)
    K = np.array([[12.0, 0, 8], [0, 12.0, 8], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 0, 4.0]
    tile = make_tile_renderer(
        EvalHyper(model=model, nc_eval=8, nf_eval=8, samp_near=2.0,
                  samp_far=6.0, dir_encoder="sh", sh_degree=4),
        jnp.asarray(pos_b), jnp.asarray(dir_b))
    out = render_pose(tile, pc, pf, c2w, 16, 16, K, eval_chunk=128)
    assert np.isfinite(out["rgb"]).all() and np.isfinite(out["depth"]).all()


def test_sh_occupancy_probe_runs():
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    from nerf_sandbox_tpu.models.occupancy import (OccupancyConfig,
                                                   init_occupancy_grid,
                                                   make_occupancy_updater)
    model = NeRFConfig(63, 16, n_layers=2, hidden_dim=32, skip_pos=1)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    occ = OccupancyConfig(resolution=8, lo=(-1.0, -1.0, -1.0),
                          hi=(1.0, 1.0, 1.0), n_probes=8)
    pos_b, dir_b = vanilla_encoders()
    upd = make_occupancy_updater(model, jnp.asarray(pos_b),
                                 jnp.asarray(dir_b), occ,
                                 dir_encoder="sh", sh_degree=4)
    grid = upd(init_occupancy_grid(occ), params, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(grid)).all()


def test_sh_trainer_cli(tmp_path, capsys):
    from nerf_sandbox_tpu.scripts.train_nerf import main
    from tests.test_loaders import _make_blender
    scene = _make_blender(tmp_path / "scene", n_frames=3, size=12)
    out = tmp_path / "exp"
    main(["--data_root", str(scene), "--data_kind", "blender",
          "--out_dir", str(out), "--dir_enc", "sh", "--sh_degree", "3",
          "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
          "--rays_per_batch", "32", "--nc", "4", "--nf", "8",
          "--num_val_steps", "1", "--log_every", "8",
          "--progress_frames", "0", "--eval_chunk", "128",
          "--max_steps", "8", "--ckpt_every", "8"])
    txt = capsys.readouterr().out
    assert "spherical harmonics degree 3 (9 dims)" in txt
    assert (out / "checkpoints" / "ckpt_0000008.ckpt").exists()
