"""Scene contraction (--scene_contraction), disparity sampling (--lindisp)
and the proposal resample anneal (--prop_anneal_steps) — mip-NeRF 360
machinery (beyond-reference; the reference's only unbounded-scene tool is
the NDC warp, ray_utils.py:92-126)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.core.encoding import scene_contract
from nerf_sandbox_tpu.core.sampling import (resample_midpoints,
                                            stratified_samples)


# ---------------------------------------------------------------- contract

def test_contract_identity_inside_unit_ball():
    x = jnp.array([[0.0, 0.0, 0.0], [0.3, -0.4, 0.5], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(scene_contract(x)), np.asarray(x),
                               atol=1e-6)


def test_contract_maps_into_radius_two_ball():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(256, 3)) * 100.0, jnp.float32)
    n = np.linalg.norm(np.asarray(scene_contract(x)), axis=-1)
    assert (n < 2.0).all()
    # a very distant point lands just inside the shell boundary
    far = scene_contract(jnp.array([[1e6, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(far), [[2.0, 0.0, 0.0]], atol=1e-4)


def test_contract_continuous_and_monotone():
    # continuity at ||x|| = 1
    a = scene_contract(jnp.array([[1.0 - 1e-6, 0.0, 0.0]]))
    b = scene_contract(jnp.array([[1.0 + 1e-6, 0.0, 0.0]]))
    assert abs(float(a[0, 0]) - float(b[0, 0])) < 1e-4
    # radius mapping is monotone (order of depths is preserved)
    r = jnp.linspace(0.1, 50.0, 64)
    x = jnp.stack([r, jnp.zeros_like(r), jnp.zeros_like(r)], -1)
    out = np.asarray(scene_contract(x))[:, 0]
    assert (np.diff(out) > 0).all()
    # direction is preserved
    v = jnp.array([[3.0, 4.0, 0.0]])
    c = np.asarray(scene_contract(v))[0]
    np.testing.assert_allclose(c / np.linalg.norm(c), [0.6, 0.8, 0.0],
                               atol=1e-6)


def test_contract_differentiable():
    g = jax.grad(lambda x: jnp.sum(scene_contract(x)))(
        jnp.array([[0.5, 0.0, 0.0], [5.0, 1.0, -2.0]]))
    assert np.isfinite(np.asarray(g)).all()


# ----------------------------------------------------------------- lindisp

def test_lindisp_endpoints_and_spacing():
    z = np.asarray(stratified_samples(2.0, 6.0, 65, lindisp=True))
    assert abs(z[0] - 2.0) < 1e-6 and abs(z[-1] - 6.0) < 1e-5
    assert (np.diff(z) > 0).all()
    # t=0.5 hits the harmonic midpoint 2/(1/near + 1/far) = 3.0, not 4.0
    assert abs(z[32] - 3.0) < 1e-5
    # disparity (1/z) is uniformly spaced
    disp = 1.0 / z
    np.testing.assert_allclose(np.diff(disp), np.diff(disp)[0], rtol=1e-4)


def test_lindisp_off_matches_linear():
    a = np.asarray(stratified_samples(2.0, 6.0, 33))
    b = np.asarray(stratified_samples(2.0, 6.0, 33, lindisp=False))
    np.testing.assert_array_equal(a, b)
    assert abs(a[16] - 4.0) < 1e-6


# ------------------------------------------------------------------ anneal

def test_resample_power_one_is_identity():
    z = jnp.linspace(2.0, 6.0, 9)[None].repeat(4, 0)
    w = jax.random.uniform(jax.random.PRNGKey(0), (4, 9))
    a = resample_midpoints(z, w, 16, deterministic=True)
    b = resample_midpoints(z, w, 16, deterministic=True, power=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resample_power_zero_flattens_to_uniform():
    """power→0 must erase the histogram: samples from a sharply peaked
    weight profile spread (near-)uniformly over the bin range."""
    z = jnp.linspace(2.0, 6.0, 33)[None]
    w = jnp.zeros((1, 33)).at[0, 16].set(100.0)     # one dominant bin
    peaked = np.asarray(resample_midpoints(z, w, 64, deterministic=True))
    flat = np.asarray(resample_midpoints(z, w, 64, deterministic=True,
                                         power=0.0))
    # peaked: almost all samples inside the hot bins (the deterministic
    # u=0/u=1 endpoints always map to the range edges — exclude them)
    assert np.mean(np.abs(peaked - 4.0) < 0.25) > 0.9
    # annealed-flat: spread across the whole [2,6] range
    assert np.std(flat) > 0.9
    assert flat.min() < 2.3 and flat.max() > 5.7


def test_proposal_anneal_train_step_runs_and_learns():
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)
    from tests.test_train_step import _scene

    arrs = SceneArrays.from_scene(_scene())
    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=64, skip_pos=1)
    prop = NeRFConfig(63, 27, n_layers=2, hidden_dim=32, skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=16, samp_near=2.0, samp_far=6.0,
                       sampling_mode="proposal", prop_model=prop, n_prop=8,
                       prop_anneal_steps=20, prop_anneal_slope=10.0)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    tx = make_optimizer(5e-3, "none", {})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=2.0, far=6.0)
    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b))
    losses = []
    for _ in range(25):
        state, m = step_fn(state, arrs)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


# --------------------------------------------------- contraction end-to-end

def test_contracted_train_step_learns():
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)
    from tests.test_train_step import _scene

    arrs = SceneArrays.from_scene(_scene())
    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=64, skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=16, samp_near=2.0, samp_far=6.0,
                       scene_contraction=True, lindisp=True)
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
    # learning at this micro scale is slow for EVERY mode (the plain
    # hierarchical config improves ~0.01 in 30 steps); the assertion is
    # that contraction+lindisp trains as the plain path does, not that it
    # converges
    assert np.mean(losses[-10:]) < np.mean(losses[:5])


def test_contracted_eval_renderer_runs(tmp_path):
    """Tile renderer with contraction+lindisp produces finite outputs and
    differs from the uncontracted render (the warp actually reaches the
    encoder)."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    from nerf_sandbox_tpu.render.renderer import EvalHyper, make_tile_renderer

    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=64, skip_pos=1)
    key = jax.random.PRNGKey(3)
    pc = init_nerf_params(key, model, near=2.0, far=6.0)
    pf = init_nerf_params(jax.random.fold_in(key, 1), model, near=2.0, far=6.0)
    pos_b, dir_b = vanilla_encoders()

    T = 64
    ro = jnp.zeros((T, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (T, 1))
    rn = jnp.ones((T, 1))
    kwargs = dict(model=model, nc_eval=8, nf_eval=8, samp_near=0.5,
                  samp_far=20.0, white_bkgd=True, compute_dtype="float32")
    outs = {}
    for name, flags in (("plain", {}),
                        ("contracted", dict(scene_contraction=True,
                                            lindisp=True))):
        rt = make_tile_renderer(EvalHyper(**kwargs, **flags),
                                jnp.asarray(pos_b), jnp.asarray(dir_b))
        rgb, acc, depth = rt(pc, pf, ro, rd, rn, rd, jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(rgb)).all()
        assert np.isfinite(np.asarray(depth)).all()
        outs[name] = np.asarray(rgb)
    assert not np.allclose(outs["plain"], outs["contracted"])


def test_cli_contraction_proposal_e2e(tmp_path):
    """Full CLI flow: proposal sampling + anneal + contraction + lindisp."""
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    main(["--data_root", str(scene), "--out_dir", str(out),
          "--data_kind", "blender", "--sampling", "proposal",
          "--prop_layers", "2", "--prop_hidden", "32", "--prop_samples", "4",
          "--prop_anneal_steps", "3", "--scene_contraction", "true",
          "--lindisp", "true",
          "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
          "--max_steps", "4", "--rays_per_batch", "32", "--nc", "4",
          "--nf", "8", "--num_val_steps", "1", "--ckpt_every", "4",
          "--log_every", "2", "--progress_frames", "2",
          "--eval_chunk", "128"])
    assert (out / "checkpoints" / "ckpt_0000004.ckpt").exists()
