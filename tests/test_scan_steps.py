"""Fused multi-step training (--scan_steps): boundary exactness + CLI."""

import numpy as np

from tests.test_loaders import _make_blender


def test_cli_scan_steps_hits_boundaries(tmp_path):
    """An EXPLICIT --scan_steps chunks from step 1 (the step-100 warm-up
    gate applies only to the default value — ADVICE r4); boundaries must
    remain step-exact everywhere."""
    from nerf_sandbox_tpu.scripts.train_nerf import main
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    main(["--data_root", str(scene), "--out_dir", str(out),
          "--data_kind", "blender", "--scan_steps", "8",
          "--max_steps", "120", "--rays_per_batch", "32", "--nc", "4",
          "--nf", "4", "--val_every", "105", "--ckpt_every", "105",
          "--log_every", "50", "--progress_frames", "2",
          "--eval_chunk", "128"])
    # ckpt/val exactly at the 105-step boundary despite scan=8 chunks
    # running past step 100, and the end-of-run boundary at 120
    assert (out / "checkpoints" / "ckpt_0000105.ckpt").exists()
    val = out / "validation" / "val_idx0000" / "rgb"
    steps = sorted(p.name for p in val.glob("step_*.png"))
    assert "step_0000105.png" in steps
    # no off-boundary validation leaked out of a scan chunk
    assert all(int(s[5:12]) % 105 == 0 or int(s[5:12]) == 120
               for s in steps), steps


def test_scan_chunk_equals_singles():
    import jax.numpy as jnp
    from tests.test_train_step import _scene
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)
    import jax

    arrs = SceneArrays.from_scene(_scene())
    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=64, skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=8, samp_near=2.0, samp_far=6.0)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    tx = make_optimizer(5e-4, "none", {})
    pos_b, dir_b = vanilla_encoders()

    single = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                              jnp.asarray(dir_b))
    chunk = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                             jnp.asarray(dir_b), scan_steps=5)

    s1 = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0, far=6.0)
    for _ in range(5):
        s1, m1 = single(s1, arrs)
    s2 = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0, far=6.0)
    s2, m2 = chunk(s2, arrs)

    assert int(s1.step) == int(s2.step) == 5
    # same RNG stream (fold_in by step) → identical trajectories
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    a = np.asarray(s1.params_c["trunk"][0]["w"])
    b = np.asarray(s2.params_c["trunk"][0]["w"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_scan_chunk_skipped_count(monkeypatch):
    """Non-finite losses inside a scan chunk must surface as a count, not
    just the last step's flag (VERDICT r1 weak #5). The composite path is
    nan-guarded (integrator parity), so the NaN is injected at the loss."""
    import jax
    import jax.numpy as jnp
    import nerf_sandbox_tpu.train.step as step_mod
    from tests.test_train_step import _scene
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)

    arrs = SceneArrays.from_scene(_scene())
    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=64, skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=8, samp_near=2.0, samp_far=6.0)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    tx = make_optimizer(5e-4, "none", {})
    pos_b, dir_b = vanilla_encoders()

    orig = step_mod._coarse_fine_losses

    def poisoned(*a, **k):
        lc, lf = orig(*a, **k)
        return lc + jnp.float32(jnp.nan), lf

    monkeypatch.setattr(step_mod, "_coarse_fine_losses", poisoned)
    chunk_bad = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                                 jnp.asarray(dir_b), scan_steps=4)
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=2.0, far=6.0)
    w_before = np.asarray(state.params_f["trunk"][0]["w"]).copy()
    new_state, m = chunk_bad(state, arrs)      # (state buffers are donated)
    assert int(m["skipped"]) == 4
    assert not bool(m["finite"])
    # all updates skipped -> fine params untouched
    np.testing.assert_array_equal(
        np.asarray(new_state.params_f["trunk"][0]["w"]), w_before)

    monkeypatch.setattr(step_mod, "_coarse_fine_losses", orig)
    chunk_ok = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                                jnp.asarray(dir_b), scan_steps=4)
    healthy = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                               near=2.0, far=6.0)
    _, m2 = chunk_ok(healthy, arrs)
    assert int(m2["skipped"]) == 0 and bool(m2["finite"])
