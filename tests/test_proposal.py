"""Proposal-network sampling (--sampling proposal, beyond-reference):
interlevel loss contract, train-step learning, and the e2e CLI flow."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.core.sampling import interlevel_loss


def test_interlevel_loss_zero_when_proposal_covers_main():
    """A proposal histogram identical to the main one bounds it exactly —
    loss must be 0 (the mip-NeRF 360 fixed point)."""
    z = jnp.linspace(2.0, 6.0, 9)[None].repeat(4, 0)         # (4, 9)
    w = jnp.full((4, 9), 0.1)
    assert float(interlevel_loss(z, w, z, w)) == 0.0
    # a UNIFORM proposal with enough mass everywhere also bounds it
    w_hi = jnp.full((4, 9), 0.5)
    assert float(interlevel_loss(z, w, z, w_hi)) == 0.0


def test_interlevel_loss_penalizes_missed_mass():
    """Main mass concentrated where the proposal has ~none → positive loss,
    with gradient flowing INTO the proposal weights."""
    z = jnp.linspace(2.0, 6.0, 9)[None]                       # (1, 9)
    w_main = jnp.zeros((1, 9)).at[0, 3].set(0.9)              # peak mid-ray
    w_prop = jnp.zeros((1, 9)).at[0, 7].set(0.9) + 1e-6       # peak far away
    loss = float(interlevel_loss(z, w_main, z, w_prop))
    # lossfun_outer normalisation bounds each term by w_main_i (0.9 here)
    assert 0.5 < loss <= 0.91

    g = jax.grad(lambda wp: interlevel_loss(z, w_main, z, wp))(w_prop)
    assert float(jnp.abs(g[0, 3])) > 0.0   # raising prop mass there helps
    assert np.isfinite(np.asarray(g)).all()


def test_interlevel_loss_partial_overlap():
    """Offset partitions: proposal intervals straddling a main interval all
    count toward its bound (the conservative overlap-sum upper bound)."""
    z_main = jnp.array([[2.0, 3.0, 4.0]])
    w_main = jnp.array([[0.5, 0.5, 0.0]])
    z_prop = jnp.array([[2.5, 3.5, 4.5]])                     # shifted grid
    w_prop = jnp.array([[0.6, 0.6, 0.0]])
    # main [2,3): overlapped by prop [2.5,3.5) → bound 0.6 ≥ 0.5 → no excess
    # main [3,4): overlapped by both props → bound 1.2 → no excess
    assert float(interlevel_loss(z_main, w_main, z_prop, w_prop)) == 0.0


def test_proposal_train_step_learns():
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
                       sampling_mode="proposal", prop_model=prop, n_prop=8)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    tx = make_optimizer(5e-3, "none", {})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=2.0, far=6.0)
    # the coarse slot carries the SMALL proposal MLP
    assert state.params_c["trunk"][0]["w"].shape[1] == 32
    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b))
    losses = []
    p0 = np.asarray(state.params_c["trunk"][0]["w"]).copy()
    for _ in range(30):
        state, m = step_fn(state, arrs)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # the interlevel loss actually trains the proposal
    assert not np.allclose(p0, np.asarray(state.params_c["trunk"][0]["w"]))


def test_cli_proposal_e2e(tmp_path):
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    argv = ["--data_root", str(scene), "--out_dir", str(out),
            "--data_kind", "blender", "--sampling", "proposal",
            "--prop_layers", "2", "--prop_hidden", "32", "--prop_samples",
            "4", "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
            "--max_steps", "4", "--rays_per_batch", "32", "--nc", "4",
            "--nf", "8", "--num_val_steps", "1", "--ckpt_every", "4",
            "--log_every", "2", "--progress_frames", "2",
            "--eval_chunk", "128"]
    main(argv)
    assert (out / "checkpoints" / "ckpt_0000004.ckpt").exists()
    val = out / "validation" / "val_idx0000"
    assert list((val / "rgb").glob("step_*.png"))
    # resume continues in proposal mode (prop params restore into the slot)
    argv[argv.index("--max_steps") + 1] = "6"
    main(argv + ["--resume", "latest"])


def test_resample_explore_floor_spreads_samples():
    """With a concentrated PDF, explore_floor=f keeps ~f of deterministic
    draws covering the rest of the range; floor=0 is the unchanged path."""
    from nerf_sandbox_tpu.core.sampling import resample_midpoints
    z = jnp.linspace(2.0, 6.0, 33)[None]                  # (1, 33)
    w = jnp.zeros((1, 33)).at[0, 16].set(1.0)             # delta mid-ray
    zf0 = resample_midpoints(z, w, 64, deterministic=True)
    zf0b = resample_midpoints(z, w, 64, deterministic=True,
                              explore_floor=0.0)
    np.testing.assert_array_equal(np.asarray(zf0), np.asarray(zf0b))
    # without a floor (and +1e-5 padding only) nearly all samples sit in
    # the peak's two bins (width 0.25)
    peak = float(jnp.mean(jnp.abs(zf0 - 4.0) < 0.3))
    assert peak > 0.9
    zf = resample_midpoints(z, w, 64, deterministic=True,
                            explore_floor=0.5)
    outside = float(jnp.mean(jnp.abs(zf - 4.0) >= 0.3))
    # half the mass is uniform over [2,6] -> ~0.5*(1-0.6/4) = 0.42 outside
    assert 0.3 < outside < 0.6
    assert bool(jnp.all(jnp.diff(zf, axis=-1) >= 0))      # still sorted CDF


def test_proposal_train_step_with_explore_floor():
    """prop_explore_floor > 0 trains stably (finite, decreasing loss)."""
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
                       prop_explore_floor=0.3)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    tx = make_optimizer(5e-3, "none", {})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=2.0, far=6.0)
    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b))
    losses = []
    for _ in range(30):
        state, m = step_fn(state, arrs)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_distortion_anneal_ramp():
    """--distortion_anneal_steps ramps the distortion term 0->full: at
    step 1 with a long ramp the loss matches distortion-off to ~the ramp
    fraction, while the unramped loss is visibly larger."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)
    from tests.test_train_step import _scene

    arrs = SceneArrays.from_scene(_scene())
    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=64, skip_pos=1)
    prop = NeRFConfig(63, 27, n_layers=2, hidden_dim=32, skip_pos=1)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    pos_b, dir_b = vanilla_encoders()

    def first_loss(dw, anneal):
        hyper = TrainHyper(model=model, nc=8, nf=16, samp_near=2.0,
                           samp_far=6.0, sampling_mode="proposal",
                           prop_model=prop, n_prop=8, raw_noise_std=0.0,
                           distortion_weight=dw,
                           distortion_anneal_steps=anneal)
        tx = make_optimizer(5e-3, "none", {})
        state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                                 near=2.0, far=6.0)
        step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                                   jnp.asarray(dir_b))
        _, m = step_fn(state, arrs)
        return float(m["loss"])

    off = first_loss(0.0, 0)
    ramped = first_loss(1.0, 100_000)       # step 1 -> scale 1e-5
    full = first_loss(1.0, 0)
    assert abs(ramped - off) < 0.05 * abs(full - off)
    assert full > off                        # distortion really adds mass
