"""Hash-grid encoder tests: shapes, interpolation properties, trainability,
and end-to-end CLI integration of the second model family."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.models.hashgrid import (
    HashGridConfig, hash_encode, init_hash_tables)


CFG = HashGridConfig(n_levels=4, n_features=2, log2_table_size=10,
                     base_res=4, max_res=32, aabb_scale=1.0)


def test_shapes_and_outdim():
    tables = init_hash_tables(jax.random.PRNGKey(0), CFG)
    assert tables.shape == (4, 1024, 2)
    pts = jax.random.normal(jax.random.PRNGKey(1), (100, 3)) * 0.5
    enc = hash_encode(tables, pts, CFG)
    assert enc.shape == (100, CFG.out_dim) == (100, 8)
    assert np.isfinite(np.asarray(enc)).all()


def test_level_resolutions_geometric():
    res = CFG.level_resolutions()
    assert res[0] == 4 and res[-1] == 32
    assert all(b >= a for a, b in zip(res, res[1:]))


def test_interpolation_continuity():
    # encoding must be continuous: tiny position changes → tiny feature changes
    tables = init_hash_tables(jax.random.PRNGKey(0), CFG) * 1e4  # O(1) features
    p = jnp.array([[0.123, -0.221, 0.4]])
    e1 = hash_encode(tables, p, CFG)
    e2 = hash_encode(tables, p + 1e-5, CFG)
    assert float(jnp.abs(e1 - e2).max()) < 1e-2


def test_exact_at_grid_corner():
    # at an exact lattice point the encoding equals that corner's feature
    cfg = HashGridConfig(n_levels=1, n_features=2, log2_table_size=8,
                         base_res=5, max_res=5, aabb_scale=1.0)
    tables = init_hash_tables(jax.random.PRNGKey(0), cfg) * 1e4
    # world point mapping exactly to integer grid coord (2,2,2) of a 5-grid
    x01 = 2.0 / 4.0
    p_world = jnp.array([[(x01 - 0.5) * 2.0]* 3])
    enc = hash_encode(tables, p_world, cfg)
    from nerf_sandbox_tpu.models.hashgrid import _hash_corner
    idx = _hash_corner(jnp.array([[2, 2, 2]]), cfg.log2_table_size)[0]
    np.testing.assert_allclose(np.asarray(enc[0]), np.asarray(tables[0, idx]),
                               rtol=1e-5)


def test_gradients_flow_to_tables():
    tables = init_hash_tables(jax.random.PRNGKey(0), CFG)
    pts = jax.random.normal(jax.random.PRNGKey(1), (64, 3)) * 0.5

    g = jax.grad(lambda t: jnp.sum(hash_encode(t, pts, CFG) ** 2))(tables)
    assert float(jnp.abs(g).max()) > 0.0
    # gradient is sparse: only touched entries are nonzero
    assert float((jnp.abs(g) > 0).mean()) < 0.5


def test_train_step_with_hashgrid_learns():
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.data.scene import Frame, Scene
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)

    rng = np.random.RandomState(0)
    K = np.array([[12.0, 0, 8], [0, 12.0, 8], [0, 0, 1]], np.float32)
    frames = []
    for i in range(2):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0, 0, 4.0]
        frames.append(Frame(image=rng.uniform(0, 1, (16, 16, 3)).astype(np.float32),
                            K=K, c2w=c2w))
    scene = SceneArrays.from_scene(Scene(frames=frames))

    hcfg = HashGridConfig(n_levels=4, n_features=2, log2_table_size=10,
                          base_res=4, max_res=32, aabb_scale=4.0)
    model = NeRFConfig(enc_pos_dim=hcfg.out_dim, enc_dir_dim=27, n_layers=2,
                       hidden_dim=64, skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=8, samp_near=2.0, samp_far=6.0,
                       pos_encoder="hashgrid", enc_cfg=hcfg)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    tx = make_optimizer(5e-3, "none", {})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0, far=6.0)
    assert "pos_grid" in state.params_c

    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b))
    losses = []
    # host copy — the train step donates (and deletes) the state buffers
    g0 = np.asarray(state.params_c["pos_grid"])
    for _ in range(25):
        state, m = step_fn(state, scene)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # hash tables actually updated by the optimizer
    assert float(np.abs(np.asarray(state.params_c["pos_grid"]) - g0).max()) > 1e-6


def test_cli_hashgrid_smoke(tmp_path):
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    main(["--data_root", str(scene), "--out_dir", str(out),
          "--data_kind", "blender", "--encoder", "hashgrid",
          "--hash_levels", "4", "--hash_log2_size", "10",
          "--hash_base_res", "4", "--hash_max_res", "32",
          "--n_layers", "2", "--hidden_dim", "64", "--skip_pos", "1",
          "--max_steps", "4", "--rays_per_batch", "32", "--nc", "4",
          "--nf", "4", "--num_val_steps", "1", "--ckpt_every", "4",
          "--log_every", "2", "--progress_frames", "2", "--eval_chunk", "128"])
    assert (out / "checkpoints" / "ckpt_0000004.ckpt").exists()
