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


def test_resize_identity_and_linear_exactness():
    """Same-res resize is exact; a LINEAR plane field resamples exactly at
    any resolution (the bilinear kernel reproduces affine functions), so
    eval pooling only loses content above the pooled Nyquist rate."""
    from nerf_sandbox_tpu.models.kplanes import resize_kplanes_params
    params = init_kplanes_params(jax.random.PRNGKey(0), CFG)
    same, cfg_same = resize_kplanes_params(params, CFG, CFG.plane_res)
    for k in params:
        np.testing.assert_array_equal(np.asarray(same[k]),
                                      np.asarray(params[k]))
    assert cfg_same.plane_res == CFG.plane_res

    # linear field on the 16-res scale: f(u,v) = 2u - v per feature offset
    lin = dict(params)
    R = 16
    u = np.linspace(0, 1, R, dtype=np.float32)
    for name in ("xy", "xz", "yz"):
        f = (2.0 * u[:, None] - u[None, :])[..., None].repeat(4, -1)
        lin[f"plane1_{name}"] = jnp.asarray(f)
    small, cfg_small = resize_kplanes_params(lin, CFG, (8, 8))
    assert cfg_small.plane_res == (8, 8)
    u8 = np.linspace(0, 1, 8, dtype=np.float32)
    expect = (2.0 * u8[:, None] - u8[None, :])[..., None].repeat(4, -1)
    np.testing.assert_allclose(np.asarray(small["plane1_xy"]), expect,
                               atol=1e-5)

    # encoding with the pooled tables approximates the full-res encoding
    # for smooth content (the N(1, 0.1) init is low-frequency-ish): check
    # the pooled cfg/params pair is consistent and finite end-to-end
    pts = jax.random.uniform(jax.random.PRNGKey(2), (64, 3),
                             minval=-0.9, maxval=0.9)
    out = kplanes_encode(small, pts, cfg_small, compute_dtype=jnp.float32)
    assert out.shape == (64, cfg_small.out_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_eval_kp_pool_cli(tmp_path):
    """--eval_kp_pool pools plane tables for validation renders only:
    training state and checkpoints keep full resolution."""
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    root = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    main(["--data_root", str(root), "--out_dir", str(out),
          "--data_kind", "blender", "--max_steps", "4",
          "--rays_per_batch", "32", "--nc", "4", "--nf", "4",
          "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
          "--encoder", "kplanes", "--kp_plane_res", "8,16",
          "--kp_plane_features", "4", "--kp_line_res", "32",
          "--kp_line_features", "4", "--eval_kp_pool", "2",
          "--num_val_steps", "1", "--ckpt_every", "4", "--log_every", "2",
          "--eval_chunk", "64"])
    assert (out / "checkpoints" / "ckpt_0000004.ckpt").exists()
    val = out / "validation" / "val_idx0000"
    assert list((val / "rgb").glob("step_*.png"))
    # checkpoint keeps FULL-res tables
    ck = np.load(out / "checkpoints" / "ckpt_0000004.ckpt",
                 allow_pickle=True)
    kk = [k for k in ck.files
          if "plane1_xy" in k and k.startswith("params_f")]
    assert kk and ck[kk[0]].shape[0] == 16


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


def test_kplanes_hybrid_freqs():
    """--kp_hybrid_freqs: out_dim grows by 3+6L; the tail of the encoding
    is exactly the positional encoding of the box-normalized coords (the
    plane features are untouched); works through the chunked path too."""
    from nerf_sandbox_tpu.core.encoding import (make_frequency_bands,
                                                positional_encoding)
    base = KPlanesConfig(plane_res=(8,), plane_features=4, line_res=16,
                         line_features=4, aabb_scale=2.0, chunk=64)
    hyb = base._replace(hybrid_freqs=3)
    assert hyb.out_dim == base.out_dim + 3 + 6 * 3

    key = jax.random.PRNGKey(0)
    params = init_kplanes_params(key, base)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (100, 3),
                             minval=-2.0, maxval=2.0)   # > chunk → chunked
    e_base = kplanes_encode(params, pts, base, compute_dtype=jnp.float32)
    e_hyb = kplanes_encode(params, pts, hyb, compute_dtype=jnp.float32)
    assert e_hyb.shape == (100, hyb.out_dim)
    np.testing.assert_array_equal(np.asarray(e_hyb[:, :base.out_dim]),
                                  np.asarray(e_base))
    xn = np.clip(np.asarray(pts) / (2 * 2.0) + 0.5, 0, 1) * 2 - 1
    want = positional_encoding(jnp.asarray(xn, jnp.float32),
                               jnp.asarray(make_frequency_bands(3)))
    np.testing.assert_allclose(np.asarray(e_hyb[:, base.out_dim:]),
                               np.asarray(want), rtol=1e-5, atol=1e-6)


def test_kplanes_hybrid_default_six(tmp_path):
    """--kp_hybrid_freqs defaults to 6 (round 5, measured: neutral-to-
    positive bounded, +11 dB contracted — RESULTS.md); an explicit 0
    builds plain planes."""
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.config import (Config, apply_path_defaults,
                                         build_argparser, make_cfg_from_args)
    from nerf_sandbox_tpu.train.trainer import Trainer
    assert Config.kp_hybrid_freqs == 6
    root = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    base = ["--data_root", str(root), "--out_dir", str(tmp_path / "e"),
            "--data_kind", "blender", "--encoder", "kplanes",
            "--kp_plane_res", "8", "--kp_plane_features", "4",
            "--kp_line_res", "16", "--kp_line_features", "4",
            "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
            "--nc", "4", "--nf", "8", "--rays_per_batch", "32",
            "--eval_chunk", "128"]

    def mk(argv):
        return apply_path_defaults(
            make_cfg_from_args(build_argparser().parse_args(argv)),
            "blender")

    tr = Trainer(mk(base))
    assert tr.enc_cfg.hybrid_freqs == 6
    assert tr.enc_cfg.out_dim == 4 + 4 + (3 + 6 * 6)   # planes+line+hybrid
    tr0 = Trainer(mk(base + ["--kp_hybrid_freqs", "0"]))
    assert tr0.enc_cfg.hybrid_freqs == 0


def test_kplanes_tv_contract():
    """TV prior: 0 on constant tables, positive on noise, smaller on smooth
    ramps than on noise of the same magnitude."""
    from nerf_sandbox_tpu.models.kplanes import kplanes_tv
    cfg = KPlanesConfig(plane_res=(8,), plane_features=2, line_res=16,
                        line_features=2)
    const = {k: jnp.ones_like(v) for k, v in
             init_kplanes_params(jax.random.PRNGKey(0), cfg).items()}
    assert float(kplanes_tv(const)) == 0.0

    noisy = init_kplanes_params(jax.random.PRNGKey(0), cfg)
    tv_noisy = float(kplanes_tv(noisy))
    assert tv_noisy > 0.0

    # same per-texel std (0.1) as the init, but varying smoothly
    ramp = jnp.linspace(-0.1, 0.1, 8)
    smooth = dict(const)
    for name in list(smooth):
        if name.startswith("plane"):
            smooth[name] = 1.0 + jnp.broadcast_to(
                ramp[:, None, None], smooth[name].shape)
    assert float(kplanes_tv(smooth)) < 0.1 * tv_noisy

    # gradient flows into the tables
    g = jax.grad(kplanes_tv)(noisy)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())
    assert float(jnp.abs(g["plane0_xy"]).max()) > 0.0


def test_grid_weight_decay_moves_tables_toward_neutral():
    """With zero gradients, --grid_weight_decay pulls pos_grid toward the
    target (kplanes neutral 1.0) and leaves MLP params untouched."""
    from nerf_sandbox_tpu.train.step import make_optimizer
    tx = make_optimizer(1e-3, "none", {}, grid_weight_decay=0.1,
                        grid_decay_target=1.0)
    params = {"f": {"trunk": jnp.full((4,), 3.0),
                    "pos_grid": {"plane0_xy": jnp.full((4,), 3.0)}}}
    state = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, state, params)
    import optax
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["f"]["trunk"]), 3.0)
    # grid moved toward 1.0 by wd*(p-target) = 0.1*2 = 0.2
    np.testing.assert_allclose(
        np.asarray(new["f"]["pos_grid"]["plane0_xy"]), 2.8, rtol=1e-6)


def test_kp_tv_weight_train_step_smooths_tables():
    """A train step with --kp_tv_weight trains stably and ends with
    smoother tables than the same run without it."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.kplanes import kplanes_tv
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)
    from tests.test_train_step import _scene

    arrs = SceneArrays.from_scene(_scene())
    kcfg = KPlanesConfig(plane_res=(8,), plane_features=4, line_res=16,
                         line_features=4, chunk=4096)
    model = NeRFConfig(kcfg.out_dim, 27, n_layers=2, hidden_dim=64,
                       skip_pos=1)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    pos_b, dir_b = vanilla_encoders()

    def run(tv):
        hyper = TrainHyper(model=model, nc=8, nf=16, samp_near=2.0,
                           samp_far=6.0, pos_encoder="kplanes", enc_cfg=kcfg,
                           kp_tv_weight=tv)
        tx = make_optimizer(5e-3, "none", {}, grid_lr=5e-2)
        state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                                 near=2.0, far=6.0)
        step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                                   jnp.asarray(dir_b))
        losses = []
        for _ in range(25):
            state, m = step_fn(state, arrs)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        return float(kplanes_tv(state.params_f["pos_grid"]))

    assert run(tv=1e-2) < run(tv=0.0)
