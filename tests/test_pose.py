"""BARF-style camera refinement (--pose_opt): se3 math + learning contracts.

Beyond-reference capability (BARF, Lin et al. 2021 / NeRF--): per-frame
se3 deltas trained through ray generation. Contracts pinned here:

* so3_exp is a correct, Taylor-guarded Rodrigues map (orthonormal, det 1,
  matches the closed form, exact identity + finite gradients at zero);
* zero deltas reproduce the un-refined ray batch bit-for-bit;
* the step learns: against a trained frozen model, registration recovers
  an injected pose jitter almost exactly (the gradient-path correctness
  check — joint recovery from large jitter needs BARF-length schedules);
* CLI e2e: --pose_opt trains, checkpoints the delta table, and resumes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.core.pose import apply_pose_delta, so3_exp


def test_so3_exp_matches_rodrigues():
    rng = np.random.default_rng(0)
    w = rng.uniform(-2, 2, (32, 3)).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray(w)))
    for i in range(len(w)):
        th = np.linalg.norm(w[i])
        k = w[i] / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        expect = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        np.testing.assert_allclose(R[i], expect, atol=2e-6)
    # orthonormal, det 1
    np.testing.assert_allclose(R @ np.transpose(R, (0, 2, 1)),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_so3_exp_identity_and_gradient_at_zero():
    R0 = np.asarray(so3_exp(jnp.zeros((3,))))
    np.testing.assert_array_equal(R0, np.eye(3, dtype=np.float32))
    g = jax.grad(lambda w: jnp.sum(so3_exp(w) * jnp.arange(9.0).reshape(3, 3)))(
        jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()
    # d/dw of exp at 0 is the hat-map generator: check one component
    eps = 1e-4
    num = (np.asarray(so3_exp(jnp.asarray([eps, 0.0, 0.0])))
           - np.eye(3)) / eps
    hat = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    np.testing.assert_allclose(num, hat, atol=1e-3)


def test_apply_pose_delta_zero_is_identity_and_composition():
    rng = np.random.default_rng(1)
    c2w = rng.standard_normal((5, 3, 4)).astype(np.float32)
    out = np.asarray(apply_pose_delta(jnp.asarray(c2w), jnp.zeros((5, 6))))
    np.testing.assert_array_equal(out, c2w)
    # pure translation delta adds to t and leaves R alone
    d = np.zeros((5, 6), np.float32)
    d[:, 3:] = [0.1, -0.2, 0.3]
    out = np.asarray(apply_pose_delta(jnp.asarray(c2w), jnp.asarray(d)))
    np.testing.assert_array_equal(out[:, :, :3], c2w[:, :, :3])
    np.testing.assert_allclose(out[:, :, 3], c2w[:, :, 3] + d[:, 3:],
                               rtol=1e-6)


def test_zero_delta_rays_bit_exact():
    from tests.test_appearance import _gain_scene
    from nerf_sandbox_tpu.data.sampler import (RayBatchSpec, SceneArrays,
                                               rays_for_pixels,
                                               sample_pixels,
                                               sample_ray_batch)
    scene = _gain_scene([1.0, 1.0, 1.0])
    arrs = SceneArrays.from_scene(scene)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    key = jax.random.PRNGKey(3)

    # one program computes both variants: zero-delta must be bit-identical
    # to no-delta (so3_exp(0) is the exact identity; I@R and t+0 are exact)
    @jax.jit
    def both(k):
        pix = sample_pixels(k, jnp.int32(1), arrs, spec)
        none = rays_for_pixels(arrs, spec, pix["frame_ids"], pix["xs"],
                               pix["ys"])
        zero = rays_for_pixels(arrs, spec, pix["frame_ids"], pix["xs"],
                               pix["ys"], pose_delta=jnp.zeros((64, 6)))
        return none, zero

    none, zero = both(key)
    for k in none:
        np.testing.assert_array_equal(np.asarray(zero[k]),
                                      np.asarray(none[k]), k)
    # and the two-stage composition IS sample_ray_batch (same draws)
    batch = sample_ray_batch(key, jnp.int32(1), arrs, spec)
    np.testing.assert_allclose(np.asarray(none["rays_o_world"]),
                               np.asarray(batch["rays_o_world"]), atol=1e-6)


def test_barf_band_weights_schedule():
    from nerf_sandbox_tpu.core.encoding import barf_band_weights
    w0 = np.asarray(barf_band_weights(0, 100, 10))
    np.testing.assert_allclose(w0, 0.0)
    wend = np.asarray(barf_band_weights(100, 100, 10))
    np.testing.assert_allclose(wend, 1.0)
    wmid = np.asarray(barf_band_weights(50, 100, 10))
    np.testing.assert_allclose(wmid[:5], 1.0)    # alpha=5: bands 0-4 full
    np.testing.assert_allclose(wmid[5:], 0.0)    # bands 5+ not started
    w55 = np.asarray(barf_band_weights(55, 100, 10))
    assert 0.0 < w55[5] < 1.0 and w55[6] == 0.0  # band 5 mid-fade
    # monotone per band over time
    ts = np.stack([np.asarray(barf_band_weights(t, 100, 10))
                   for t in range(0, 101, 5)])
    assert (np.diff(ts, axis=0) >= -1e-7).all()


def test_pose_registration_recovers_injected_jitter(tmp_path):
    """The precise mechanism check: train a NeRF on TRUE poses, inject a
    known +0.1x translation into ONE frame's pose, freeze the MLP (main
    lr 0) and let --pose_opt register the cameras. The learned delta must
    recover ~the inverse of the injected jitter while untouched frames
    stay near identity.

    (Joint pose+NeRF recovery from LARGE jitter needs BARF-length
    schedules — measured here on CPU scales: without --barf_anneal_steps
    the joint run diverges outright, with it it is merely slow — hence
    the trainer's hint and this registration-style unit contract.)"""
    from tests.make_sphere_scene import make_scene
    from nerf_sandbox_tpu.data.blender_loader import BlenderSceneLoader
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (TrainHyper, build_train_step,
                                             init_train_state, make_optimizer)
    root = make_scene(tmp_path / "scene", views=8, size=48, val_views=1)
    scene = BlenderSceneLoader(root).load("train")
    true = np.stack([np.asarray(f.c2w, np.float32)[:3] for f in scene.frames])
    model = NeRFConfig(63, 27, n_layers=3, hidden_dim=96, skip_pos=1)
    pos_b, dir_b = vanilla_encoders()
    h1 = TrainHyper(model=model, nc=24, nf=24, samp_near=2.0, samp_far=6.0,
                    raw_noise_std=0.0)
    spec = RayBatchSpec(rays_per_batch=192, image_h=48, image_w=48)
    tx1 = make_optimizer(5e-3, "none", {})
    st = init_train_state(jax.random.PRNGKey(0), h1, tx1, near=2.0, far=6.0)
    arrs = SceneArrays.from_scene(scene)
    f1 = build_train_step(h1, spec, tx1, jnp.asarray(pos_b),
                          jnp.asarray(dir_b))
    for _ in range(500):
        st, _ = f1(st, arrs)

    jit = true.copy()
    jit[0, :, 3] += np.array([0.1, 0.0, 0.0], np.float32)
    arrs_jit = SceneArrays(arrs.images, arrs.Ks, jnp.asarray(jit))
    h2 = h1._replace(pose_opt=True, n_pose_frames=8)
    tx2 = make_optimizer(0.0, "none", {}, pose_lr=3e-3)
    st2 = init_train_state(jax.random.PRNGKey(0), h2, tx2, near=2.0, far=6.0)
    st2 = st2._replace(
        params_c=st.params_c,
        params_f={**st.params_f,
                  "pose_delta": st2.params_f["pose_delta"]})
    f2 = build_train_step(h2, spec, tx2, jnp.asarray(pos_b),
                          jnp.asarray(dir_b))
    for _ in range(400):
        st2, _ = f2(st2, arrs_jit)
    d = np.asarray(st2.params_f["pose_delta"])
    # frame 0's translation delta counteracts the injected +0.1x
    np.testing.assert_allclose(d[0, 3:], [-0.1, 0.0, 0.0], atol=0.04)
    assert float(np.abs(d[0, :3]).max()) < 0.05       # rotation ~identity
    # untouched frames drift only within the trained model's blur level,
    # well under the recovered 0.1 signal
    assert float(np.abs(d[1:]).max()) < 0.08


def test_pose_cli_and_resume(tmp_path, capsys):
    from nerf_sandbox_tpu.scripts.train_nerf import main
    from tests.test_loaders import _make_blender
    scene = _make_blender(tmp_path / "scene", n_frames=3, size=12)
    out = tmp_path / "exp"
    common = ["--data_root", str(scene), "--data_kind", "blender",
              "--out_dir", str(out), "--pose_opt", "true",
              "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
              "--rays_per_batch", "32", "--nc", "4", "--nf", "8",
              "--num_val_steps", "1", "--log_every", "8",
              "--progress_frames", "0", "--eval_chunk", "128"]
    main(["--max_steps", "8", "--ckpt_every", "8"] + common)
    txt = capsys.readouterr().out
    assert "[pose] BARF-style refinement of 3 train poses" in txt
    assert (out / "checkpoints" / "ckpt_0000008.ckpt").exists()
    main(["--max_steps", "10", "--ckpt_every", "10", "--resume", "latest"]
         + common)
    assert (out / "checkpoints" / "ckpt_0000010.ckpt").exists()
    assert "partial restore" not in capsys.readouterr().out
