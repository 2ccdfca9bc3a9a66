"""Dynamic scenes: 4-D k-planes (--kp_time_res) + D-NeRF-format times.

Beyond-reference model family (the torch reference is static-only;
formulation: k-planes, Fridovich-Keil et al. 2023 §3 — three space-time
planes per scale join the feature product). Contracts pinned here:

* static neutrality: with the all-ones time-plane init, the 4-D encoder
  equals the 3-D encoder at every t (the static-by-default prior);
* the time axis is real: after training on a moving scene, renders at
  t=0 and t=1 differ where the object moved, and a dynamic model beats a
  static model on time-varying supervision;
* data plumbing: the loader reads per-frame "time", SceneArrays carries
  it, the ray batch exposes per-ray t, and eval/mesh paths accept times;
* CLI e2e: --encoder kplanes --kp_time_res trains + validates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.models.kplanes import (KPlanesConfig,
                                             init_kplanes_params,
                                             kplanes_encode, kplanes_tv,
                                             resize_kplanes_params)

CFG3 = KPlanesConfig(plane_res=(8, 16), plane_features=4, line_res=32,
                     line_features=8, aabb_scale=1.5, chunk=64)
CFG4 = CFG3._replace(time_res=6)


def test_outdim_and_param_shapes():
    assert CFG4.out_dim == CFG3.out_dim   # time planes multiply, not concat
    p = init_kplanes_params(jax.random.PRNGKey(0), CFG4)
    assert p["plane0_xt"].shape == (8, 6, 4)
    assert p["plane1_zt"].shape == (16, 6, 4)
    assert p["line_t"].shape == (6, 8)
    np.testing.assert_array_equal(np.asarray(p["plane0_xt"]), 1.0)
    np.testing.assert_array_equal(np.asarray(p["line_t"]), 1.0)
    # the 3-D subset of params matches the static init exactly (fold-in
    # keying: static streams untouched by the time feature's existence)
    p3 = init_kplanes_params(jax.random.PRNGKey(0), CFG3)
    for k in p3:
        np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(p3[k]), k)


def test_static_neutrality_of_ones_time_planes():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.4, 1.4, (100, 3)), jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1, (100,)), jnp.float32)
    p4 = init_kplanes_params(jax.random.PRNGKey(1), CFG4)
    p3 = {k: v for k, v in p4.items()
          if not (k.endswith(("_xt", "_yt", "_zt")) or k == "line_t")}
    e4 = kplanes_encode(p4, pts, CFG4, compute_dtype=jnp.float32, t01=t)
    e3 = kplanes_encode(p3, pts, CFG3, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(e4), np.asarray(e3),
                               rtol=1e-5, atol=1e-5)


def test_time_axis_differentiates():
    """Perturbed time planes make the encoding time-dependent, and
    gradients flow into them."""
    rng = np.random.default_rng(2)
    p = init_kplanes_params(jax.random.PRNGKey(1), CFG4)
    p["plane0_xt"] = p["plane0_xt"] + 0.3 * jnp.asarray(
        rng.standard_normal(p["plane0_xt"].shape), jnp.float32)
    pts = jnp.asarray(rng.uniform(-1, 1, (50, 3)), jnp.float32)
    e0 = kplanes_encode(p, pts, CFG4, compute_dtype=jnp.float32,
                        t01=jnp.zeros(50))
    e1 = kplanes_encode(p, pts, CFG4, compute_dtype=jnp.float32,
                        t01=jnp.ones(50))
    assert float(jnp.abs(e0 - e1).max()) > 1e-3

    def loss(params):
        e = kplanes_encode(params, pts, CFG4, compute_dtype=jnp.float32,
                           t01=jnp.full((50,), 0.37))
        return jnp.sum(e ** 2)
    g = jax.grad(loss)(p)
    assert float(jnp.abs(g["line_t"]).max()) > 0
    assert float(jnp.abs(g["plane1_yt"]).max()) > 0


def test_tv_and_resize_cover_time_planes():
    p = init_kplanes_params(jax.random.PRNGKey(3), CFG4)
    p["plane0_xt"] = p["plane0_xt"].at[0, 0, 0].set(5.0)
    assert float(kplanes_tv(p)) > 0
    pooled, cfg2 = resize_kplanes_params(p, CFG4, (4, 8))
    assert pooled["plane0_xy"].shape == (4, 4, 4)
    assert pooled["plane0_xt"].shape == (4, 6, 4)   # spatial axis only
    assert cfg2.plane_res == (4, 8) and cfg2.time_res == 6


def _dyn_scene(tmp_path, views=10, size=32):
    from tests.make_dynamic_scene import make_scene
    from nerf_sandbox_tpu.data.blender_loader import BlenderSceneLoader
    root = make_scene(tmp_path / "dyn", views=views, size=size, val_views=2)
    return BlenderSceneLoader(root).load("train")


def test_loader_and_batch_times(tmp_path):
    from nerf_sandbox_tpu.data.sampler import (RayBatchSpec, SceneArrays,
                                               sample_ray_batch)
    scene = _dyn_scene(tmp_path)
    times = [f.time for f in scene.frames]
    assert times[0] == 0.0 and times[-1] == 1.0
    assert all(t is not None for t in times)
    arrs = SceneArrays.from_scene(scene)
    np.testing.assert_allclose(np.asarray(arrs.times), times, atol=1e-6)
    spec = RayBatchSpec(rays_per_batch=64, image_h=scene.H, image_w=scene.W)
    batch = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(1), arrs, spec)
    expect = np.asarray(times, np.float32)[np.asarray(batch["frame_ids"])]
    np.testing.assert_allclose(np.asarray(batch["t"]), expect, atol=1e-6)


def _train_dyn(scene, time_res, steps):
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (TrainHyper, build_train_step,
                                             init_train_state, make_optimizer)
    enc = KPlanesConfig(plane_res=(16, 32), plane_features=4, line_res=64,
                        line_features=8, aabb_scale=1.6, chunk=4096,
                        time_res=time_res)
    arrs = SceneArrays.from_scene(scene)
    model = NeRFConfig(enc_pos_dim=enc.out_dim, enc_dir_dim=27, n_layers=2,
                       hidden_dim=32, skip_pos=1)
    hyper = TrainHyper(model=model, nc=12, nf=12, samp_near=2.0,
                       samp_far=6.0, raw_noise_std=0.0,
                       pos_encoder="kplanes", enc_cfg=enc)
    spec = RayBatchSpec(rays_per_batch=128,
                        image_h=scene.H, image_w=scene.W)
    tx = make_optimizer(5e-3, "none", {}, grid_lr=2e-2)
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=2.0, far=6.0)
    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b))
    losses = []
    for _ in range(steps):
        state, m = step_fn(state, arrs)
        losses.append(float(m["loss"]))
    return state, losses, enc, model, (pos_b, dir_b)


def test_dynamic_beats_static_on_moving_scene(tmp_path):
    """Time-varying supervision: a static model must average the motion
    (irreducible loss); the 4-D model absorbs it."""
    scene = _dyn_scene(tmp_path, views=10, size=32)
    _, static_l, _, _, _ = _train_dyn(scene, time_res=0, steps=250)
    state, dyn_l, enc, model, bands = _train_dyn(scene, time_res=8,
                                                 steps=250)
    s, d = np.mean(static_l[-15:]), np.mean(dyn_l[-15:])
    assert np.isfinite(static_l).all() and np.isfinite(dyn_l).all()
    assert d < 0.75 * s, (s, d)
    # the learned time planes moved off their neutral init
    tp = np.asarray(state.params_f["pos_grid"]["plane0_xt"])
    assert float(np.abs(tp - 1.0).max()) > 1e-2


def test_dynamic_eval_renders_differ_across_time(tmp_path):
    from nerf_sandbox_tpu.render.renderer import (EvalHyper,
                                                  make_tile_renderer,
                                                  render_pose)
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    scene = _dyn_scene(tmp_path, views=8, size=32)
    state, _, enc, model, _ = _train_dyn(scene, time_res=8, steps=150)
    pos_b, dir_b = vanilla_encoders()
    hyper = EvalHyper(model=model, nc_eval=12, nf_eval=12, samp_near=2.0,
                      samp_far=6.0, pos_encoder="kplanes", enc_cfg=enc,
                      compute_dtype="float32")
    tile = make_tile_renderer(hyper, jnp.asarray(pos_b), jnp.asarray(dir_b))
    fr = scene.frames[0]
    r0 = render_pose(tile, state.params_c, state.params_f, fr.c2w, 32, 32,
                     fr.K, eval_chunk=256, time=0.0)
    r1 = render_pose(tile, state.params_c, state.params_f, fr.c2w, 32, 32,
                     fr.K, eval_chunk=256, time=1.0)
    assert np.isfinite(r0["rgb"]).all() and np.isfinite(r1["rgb"]).all()
    assert float(np.abs(r0["rgb"] - r1["rgb"]).max()) > 0.02


def test_dynamic_cli_end_to_end(tmp_path, capsys):
    from nerf_sandbox_tpu.scripts.train_nerf import main
    from tests.make_dynamic_scene import make_scene
    root = make_scene(tmp_path / "dyn", views=6, size=16, val_views=1)
    out = tmp_path / "exp"
    main(["--data_root", str(root), "--data_kind", "blender",
          "--out_dir", str(out), "--encoder", "kplanes",
          "--kp_time_res", "6", "--kp_plane_res", "8,16",
          "--kp_plane_features", "4", "--kp_line_res", "32",
          "--kp_line_features", "8",
          "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
          "--rays_per_batch", "32", "--nc", "4", "--nf", "8",
          "--num_val_steps", "1", "--log_every", "8",
          "--progress_frames", "0", "--eval_chunk", "128",
          "--max_steps", "8", "--ckpt_every", "8"])
    txt = capsys.readouterr().out
    assert "[dyn] 4-D kplanes: time_res=6" in txt
    assert (out / "checkpoints" / "ckpt_0000008.ckpt").exists()


def test_kp_time_res_without_times_warns(tmp_path, capsys):
    from nerf_sandbox_tpu.scripts.train_nerf import main
    from tests.test_loaders import _make_blender
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=12)
    main(["--data_root", str(scene), "--data_kind", "blender",
          "--out_dir", str(tmp_path / "exp"), "--encoder", "kplanes",
          "--kp_time_res", "4", "--kp_plane_res", "8",
          "--kp_plane_features", "4", "--kp_line_res", "16",
          "--kp_line_features", "4",
          "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
          "--rays_per_batch", "32", "--nc", "4", "--nf", "8",
          "--num_val_steps", "1", "--log_every", "8",
          "--progress_frames", "0", "--eval_chunk", "128",
          "--max_steps", "8", "--ckpt_every", "8"])
    assert "no frame in the dataset carries a 'time'" in \
        capsys.readouterr().out


def test_dynamic_mesh_time_sweep_and_occ_probes(tmp_path, capsys):
    """--mesh_time_sweep K exports K time-tagged OBJs; --occ_time_probes
    sizes the dynamic occupancy union (VERDICT r3 #5)."""
    from nerf_sandbox_tpu.scripts.train_nerf import main
    from tests.make_dynamic_scene import make_scene
    root = make_scene(tmp_path / "dyn", views=6, size=16, val_views=1)
    out = tmp_path / "exp"
    main(["--data_root", str(root), "--data_kind", "blender",
          "--out_dir", str(out), "--encoder", "kplanes",
          "--kp_time_res", "6", "--kp_plane_res", "8",
          "--kp_plane_features", "4", "--kp_line_res", "16",
          "--kp_line_features", "4",
          "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
          "--rays_per_batch", "32", "--nc", "4", "--nf", "8",
          "--sampling", "occupancy", "--occ_res", "16",
          "--occ_time_probes", "3",
          "--num_val_steps", "1", "--log_every", "8",
          "--progress_frames", "0", "--eval_chunk", "128",
          "--max_steps", "8", "--ckpt_every", "8",
          "--export_mesh", "true", "--mesh_res", "24", "--mesh_time_sweep", "3"])
    objs = sorted((out / "mesh").glob("mesh_step_*_t*.obj"))
    assert len(objs) == 3, objs
    assert objs[0].name.endswith("_t000.obj")
    txt = capsys.readouterr().out
    assert "t=0.000" in txt and "t=1.000" in txt
