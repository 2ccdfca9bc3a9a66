"""Tiled renderer + path-pose tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.core.encoding import vanilla_encoders
from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
from nerf_sandbox_tpu.render.renderer import (
    EvalHyper, make_tile_renderer, render_pose, render_rays_chunked)
from nerf_sandbox_tpu.render.path_poses import (
    blender_path, generate_path_poses, pose_spherical)
from nerf_sandbox_tpu.data.scene import Frame, Scene

MODEL = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2, hidden_dim=32,
                   skip_pos=1)


def _setup(nf_eval=8):
    pos_b, dir_b = vanilla_encoders()
    hyper = EvalHyper(model=MODEL, nc_eval=8, nf_eval=nf_eval,
                      samp_near=2.0, samp_far=6.0)
    tile = make_tile_renderer(hyper, jnp.asarray(pos_b), jnp.asarray(dir_b))
    params_c = init_nerf_params(jax.random.PRNGKey(0), MODEL)
    params_f = init_nerf_params(jax.random.PRNGKey(1), MODEL)
    return tile, params_c, params_f


def test_chunked_equals_single_tile():
    tile, pc, pf = _setup()
    n = 100
    key = jax.random.PRNGKey(0)
    ro = jax.random.normal(key, (n, 3))
    rd = ro / jnp.linalg.norm(ro, axis=-1, keepdims=True)
    rn = jnp.ones((n, 1))
    out_small = render_rays_chunked(tile, pc, pf, ro, rd, rn, rd, eval_chunk=32)
    out_big = render_rays_chunked(tile, pc, pf, ro, rd, rn, rd, eval_chunk=128)
    np.testing.assert_allclose(np.asarray(out_small["rgb"]),
                               np.asarray(out_big["rgb"]), atol=1e-5)
    assert out_small["rgb"].shape == (n, 3)


def test_render_pose_shapes():
    tile, pc, pf = _setup()
    K = np.array([[12.0, 0, 8], [0, 12.0, 6], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 4.0
    out = render_pose(tile, pc, pf, c2w, 12, 16, K, eval_chunk=64)
    assert out["rgb"].shape == (12, 16, 3)
    assert out["acc"].shape == (12, 16, 1)
    assert np.isfinite(out["rgb"]).all()
    assert (out["rgb"] >= 0).all() and (out["rgb"] <= 1).all()


def test_coarse_only_render():
    tile, pc, _ = _setup(nf_eval=0)
    K = np.array([[12.0, 0, 8], [0, 12.0, 6], [0, 0, 1]], np.float32)
    out = render_pose(tile, pc, None, np.eye(4, dtype=np.float32), 8, 8, K,
                      eval_chunk=64)
    assert out["rgb"].shape == (8, 8, 3)


# ---------------- path poses ----------------

def test_pose_spherical_radius_and_validity():
    p = pose_spherical(30.0, -30.0, 4.0)
    assert p.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 4.0, rtol=1e-5)
    # rotation block orthonormal
    R = p[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # camera looks at origin: forward (-Z) points from camera to origin
    fwd = -R[:, 2]
    to_origin = -p[:3, 3] / np.linalg.norm(p[:3, 3])
    np.testing.assert_allclose(fwd, to_origin, atol=1e-5)


def test_blender_path_count_and_rotation():
    poses = blender_path(8, rots=1.0, phi_deg=0.0)
    assert len(poses) == 8
    # equatorial full circle: consecutive azimuths differ by 45 deg
    c0, c1 = poses[0][:3, 3], poses[1][:3, 3]
    ang = np.degrees(np.arccos(
        np.clip(c0 @ c1 / (np.linalg.norm(c0) * np.linalg.norm(c1)), -1, 1)))
    assert abs(ang - 45.0) < 5.0


def test_generate_blender_path_from_scene():
    K = np.array([[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]], np.float32)
    frames = []
    for i in range(3):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0, 0, 4.0]
        frames.append(Frame(image=np.zeros((8, 8, 3), np.float32), K=K, c2w=c2w))
    scene = Scene(frames=frames)
    poses, H, W, Kout = generate_path_poses(scene, 10, path_type="blender",
                                            res_scale=0.5)
    assert len(poses) == 10 and H == 4 and W == 4
    np.testing.assert_allclose(Kout[0, 0], 5.0)
    # auto radius = median camera radius = 4
    np.testing.assert_allclose(np.linalg.norm(poses[0][:3, 3]), 4.0, rtol=1e-4)


def test_llff_spiral_from_poses_bounds(tmp_path):
    from tests.test_loaders import _make_llff
    root = _make_llff(tmp_path / "fern")
    K = np.array([[20.0, 0, 8], [0, 20.0, 6], [0, 0, 1]], np.float32)
    frames = [Frame(image=np.zeros((12, 16, 3), np.float32), K=K,
                    c2w=np.eye(4, dtype=np.float32))]
    scene = Scene(frames=frames)
    poses, H, W, _ = generate_path_poses(scene, 20, path_type="llff_spiral",
                                         data_root=root)
    assert len(poses) == 20
    for p in poses:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

    zposes, _, _, _ = generate_path_poses(scene, 20, path_type="llff_zflat",
                                          data_root=root)
    assert len(zposes) == 20


def test_eval_fine_frac_culling():
    """--eval_fine_frac contract: the top-K rays by coarse opacity match the
    full eval exactly; the culled rest keep the coarse composite."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    from nerf_sandbox_tpu.render.renderer import EvalHyper, make_tile_renderer

    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=32, skip_pos=1)
    pos_b, dir_b = vanilla_encoders()
    # softplus sigma at moderate scale: smooth, diverse per-ray opacities
    # (relu + random init saturates half the rays to acc == 1.0, creating
    # tie groups that make the top-K cut ambiguous)
    pc = init_nerf_params(jax.random.PRNGKey(0), model)
    pf = init_nerf_params(jax.random.PRNGKey(1), model)
    for p in (pc, pf):
        p["sigma_out"]["w"] = p["sigma_out"]["w"] * 0.5
        p["sigma_out"]["b"] = p["sigma_out"]["b"] - 1.0

    T = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    o = jax.random.uniform(k1, (T, 3), minval=-0.5, maxval=0.5)
    d = jax.random.normal(k2, (T, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rn = jnp.ones((T, 1))
    key = jax.random.PRNGKey(3)

    def run(**kw):
        hyp = EvalHyper(model=model, nc_eval=8, nf_eval=kw.pop("nf", 8),
                        samp_near=2.0, samp_far=6.0,
                        sigma_activation="softplus",
                        infinite_last_bin=False,   # else softplus>0 + the
                        # 1e10 last bin saturates every ray to acc == 1.0
                        compute_dtype="float32", **kw)
        tile = make_tile_renderer(hyp, jnp.asarray(pos_b), jnp.asarray(dir_b))
        return tile(pc, pf, o, d, rn, d, key)

    full = run()
    frac = run(eval_fine_frac=0.5)
    coarse = run(nf=0)

    acc_c = np.asarray(coarse[1][:, 0])
    # rays tied with the K-th opacity value may land on either side of the
    # cut (sort tie-breaking) — exclude the whole tie group from the check
    kth = np.sort(acc_c)[::-1][31]                 # K = 0.5 * 64
    top = np.where(acc_c > kth)[0]
    rest = np.where(acc_c < kth)[0]
    assert len(top) >= 8 and len(rest) >= 8
    for i in range(3):
        np.testing.assert_allclose(np.asarray(frac[i])[top],
                                   np.asarray(full[i])[top], atol=1e-5)
        np.testing.assert_allclose(np.asarray(frac[i])[rest],
                                   np.asarray(coarse[i])[rest], atol=1e-6)
