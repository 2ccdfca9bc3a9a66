"""NeRF-W per-frame appearance embeddings (beyond-reference capability).

The torch reference has no appearance conditioning; this follows NeRF-W
(Martin-Brualla et al. 2021): a learned (n_train_frames, app_dim) code
table whose per-ray row feeds the color head, absorbing per-frame
photometric variation. Contracts pinned here:

* fold_appearance: a FIXED code folded into the color_fc bias is exactly
  the explicit-code forward (this is what lets every eval path — XLA and
  the fused Pallas kernel — run the app-free architecture unchanged).
* zero-code default: callers that pass no code (occupancy density probes,
  debug forwards) get the canonical zero code.
* the train step learns the table (gradients flow through the one-hot
  code gather) and codes measurably absorb per-frame exposure jitter.
* trainer wiring: --appearance_dim trains + validates end to end, and
  --eval_appearance selects the folded eval code.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.core.encoding import vanilla_encoders
from nerf_sandbox_tpu.data.scene import Frame, Scene
from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
from nerf_sandbox_tpu.models.mlp import (NeRFConfig, fold_appearance,
                                         init_nerf_params, nerf_apply)
from nerf_sandbox_tpu.train.step import (TrainHyper, build_train_step,
                                         init_train_state, make_optimizer)


def _gain_scene(gains, H=16, W=16, rotate=True):
    """Same base content per frame, per-frame RGB gain — the photometric-
    variation regime appearance codes exist for. ``rotate=False`` keeps one
    pose for every frame, so the per-frame gain is the ONLY cross-frame
    variance (the cleanest separation measurement: a code-free model's
    loss floor is exactly the gain variance)."""
    rng = np.random.RandomState(0)
    base = rng.uniform(0.2, 0.8, (H, W, 3)).astype(np.float32)
    K = np.array([[12.0, 0, W / 2], [0, 12.0, H / 2], [0, 0, 1]], np.float32)
    frames = []
    for i, g in enumerate(gains):
        th = i * 0.4 if rotate else 0.0
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                                [-np.sin(th), 0, np.cos(th)]], np.float32)
        c2w[:3, 3] = c2w[:3, :3] @ np.array([0, 0, 4.0], np.float32)
        frames.append(Frame(image=np.clip(base * g, 0, 1), K=K, c2w=c2w))
    return Scene(frames=frames, white_bkgd=True)


def test_fold_appearance_matches_explicit_code():
    cfg = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                     hidden_dim=32, skip_pos=1, app_dim=8)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    assert params["color_fc"]["w"].shape[0] == 32 + 27 + 8
    rng = np.random.default_rng(1)
    Q = 64
    enc_pos = jnp.asarray(rng.standard_normal((Q, 63)), jnp.float32)
    enc_dir = jnp.asarray(rng.standard_normal((Q, 27)), jnp.float32)
    vec = jnp.asarray(rng.standard_normal(8), jnp.float32)

    explicit = nerf_apply(params, cfg, enc_pos, enc_dir,
                          app=jnp.broadcast_to(vec, (Q, 8)))
    folded, cfg0 = fold_appearance(params, cfg, vec)
    assert cfg0.app_dim == 0
    assert folded["color_fc"]["w"].shape[0] == 32 + 27
    via_fold = nerf_apply(folded, cfg0, enc_pos, enc_dir)
    np.testing.assert_allclose(np.asarray(via_fold), np.asarray(explicit),
                               atol=1e-5)
    # sigma path is untouched by the fold (bit-identical)
    np.testing.assert_array_equal(np.asarray(via_fold[:, 3]),
                                  np.asarray(explicit[:, 3]))
    # app_dim=0 is a no-op passthrough
    p2, c2 = fold_appearance(folded, cfg0, vec)
    assert p2 is folded and c2 is cfg0


def test_zero_code_default_equals_explicit_zeros():
    cfg = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                     hidden_dim=32, skip_pos=1, app_dim=4)
    params = init_nerf_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    enc_pos = jnp.asarray(rng.standard_normal((16, 63)), jnp.float32)
    enc_dir = jnp.asarray(rng.standard_normal((16, 27)), jnp.float32)
    none = nerf_apply(params, cfg, enc_pos, enc_dir)
    zeros = nerf_apply(params, cfg, enc_pos, enc_dir,
                       app=jnp.zeros((16, 4), jnp.float32))
    np.testing.assert_array_equal(np.asarray(none), np.asarray(zeros))


def _train(scene, app_dim, steps, mode="hierarchical"):
    arrs = SceneArrays.from_scene(scene)
    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                       hidden_dim=32, skip_pos=1, app_dim=app_dim)
    kw = {}
    occ_grid = None
    if mode == "proposal":
        kw = dict(prop_model=NeRFConfig(63, 27, n_layers=2, hidden_dim=32,
                                        skip_pos=1), n_prop=8)
    elif mode == "occupancy":
        from nerf_sandbox_tpu.models.occupancy import (OccupancyConfig,
                                                       init_occupancy_grid)
        occ = OccupancyConfig(resolution=8, lo=(-1.0, -1.0, -1.0),
                              hi=(1.0, 1.0, 1.0), n_probes=8)
        kw = dict(occ_cfg=occ)
        occ_grid = init_occupancy_grid(occ)
    hyper = TrainHyper(model=model, nc=8, nf=8, samp_near=2.0, samp_far=6.0,
                       raw_noise_std=0.0, sampling_mode=mode,
                       app_dim=app_dim, n_app_frames=len(scene.frames), **kw)
    spec = RayBatchSpec(rays_per_batch=64,
                        image_h=scene.H, image_w=scene.W)
    tx = make_optimizer(5e-3, "none", {})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=2.0, far=6.0)
    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b))
    losses = []
    for _ in range(steps):
        if mode == "occupancy":
            state, m = step_fn(state, arrs, occ_grid)
        else:
            state, m = step_fn(state, arrs)
        losses.append(float(m["loss"]))
    return state, losses


@pytest.mark.parametrize("mode", ["hierarchical", "proposal", "occupancy"])
def test_table_learns_in_every_sampling_mode(mode):
    scene = _gain_scene([0.6, 1.0, 1.4])
    state, losses = _train(scene, app_dim=8, steps=12, mode=mode)
    table = np.asarray(state.params_f["app_emb"])
    assert table.shape == (3, 8)
    assert np.isfinite(losses).all()
    # gradients reached the table through the one-hot gather
    init = 0.01 * np.asarray(jax.random.normal(
        jax.random.fold_in(jax.random.PRNGKey(0), 77), (3, 8)))
    assert float(np.abs(table - init).max()) > 1e-5


def test_codes_absorb_exposure_jitter():
    """Same scene content, per-frame gains 0.6/1.0/1.4: a code-free model
    can only fit the mean appearance (irreducible per-frame variance); the
    coded model fits each frame — train loss must separate clearly."""
    scene = _gain_scene([0.6, 1.0, 1.4], rotate=False)
    _, base = _train(scene, app_dim=0, steps=500)
    _, coded = _train(scene, app_dim=8, steps=500)
    b, c = np.mean(base[-10:]), np.mean(coded[-10:])
    # code-free floor: best fit is the mean gain -> residual E[v^2]*var(g)
    # ~ 0.26 * 0.107 ~ 0.028; the coded model has no floor
    assert b > 0.005, b
    assert c < 0.5 * b, (b, c)


def test_trainer_cli_end_to_end(tmp_path, capsys):
    """--appearance_dim trains, validates (fold path), checkpoints, and
    resumes; --eval_appearance picks the folded code."""
    from nerf_sandbox_tpu.scripts.train_nerf import main
    from tests.test_loaders import _make_blender
    scene = _make_blender(tmp_path / "scene", n_frames=3, size=12)
    out = tmp_path / "exp"
    common = ["--data_root", str(scene), "--data_kind", "blender",
              "--out_dir", str(out), "--appearance_dim", "4",
              "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
              "--rays_per_batch", "32", "--nc", "4", "--nf", "8",
              "--num_val_steps", "1", "--log_every", "8",
              "--progress_frames", "0", "--eval_chunk", "128"]
    main(["--max_steps", "8", "--ckpt_every", "8"] + common)
    txt = capsys.readouterr().out
    assert "[app] NeRF-W appearance codes: 3 frames x 4" in txt
    assert (out / "checkpoints" / "ckpt_0000008.ckpt").exists()
    # resume restores the table and keeps training
    main(["--max_steps", "10", "--ckpt_every", "10", "--resume", "latest",
          "--eval_appearance", "1"] + common)
    assert (out / "checkpoints" / "ckpt_0000010.ckpt").exists()
    out2 = capsys.readouterr().out
    assert "partial restore" not in out2


def test_eval_appearance_validation(tmp_path):
    """Trainer._eval_app_vec honors mean/zero/index and eval_params() folds
    to the app-free color head shape."""
    from nerf_sandbox_tpu.config import (apply_path_defaults, build_argparser,
                                         make_cfg_from_args)
    from nerf_sandbox_tpu.train.trainer import Trainer
    from tests.test_loaders import _make_blender
    scene = _make_blender(tmp_path / "scene", n_frames=3, size=12)
    base = ["--data_root", str(scene), "--data_kind", "blender",
            "--out_dir", str(tmp_path / "e"), "--appearance_dim", "4",
            "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
            "--rays_per_batch", "32", "--nc", "4", "--nf", "8",
            "--eval_chunk", "128"]

    def mk(argv):
        return apply_path_defaults(
            make_cfg_from_args(build_argparser().parse_args(argv)), "blender")

    tr = Trainer(mk(base))
    table = np.asarray(tr.state.params_f["app_emb"])
    np.testing.assert_allclose(np.asarray(tr._eval_app_vec()),
                               table.mean(axis=0), rtol=1e-6)
    pc, pf = tr.eval_params()
    # folded: app rows gone from color_fc in BOTH eval slots
    assert pf["color_fc"]["w"].shape[0] == 32 + 27
    assert pc["color_fc"]["w"].shape[0] == 32 + 27
    assert "app_emb" not in pf

    tr0 = Trainer(mk(base + ["--eval_appearance", "zero"]))
    np.testing.assert_array_equal(np.asarray(tr0._eval_app_vec()),
                                  np.zeros(4, np.float32))
    tr1 = Trainer(mk(base + ["--eval_appearance", "1"]))
    np.testing.assert_array_equal(np.asarray(tr1._eval_app_vec()),
                                  np.asarray(tr1.state.params_f["app_emb"])[1])
    with pytest.raises(ValueError):
        Trainer(mk(base + ["--eval_appearance", "7"]))


# ---------------------------------------------------------------------------
# Per-image test-time appearance refinement (NeRF-W eval protocol;
# render/app_refine.py): the eval frame's code is optimized on the LEFT
# half of its pixels against the frozen model, rendered folded-in, and
# scored on the RIGHT half (psnr_heldout_half).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def app_refine_setup(tmp_path_factory):
    """Train ONCE (tiny shapes, --appearance_dim 4) and return the frozen
    trainer; shared by the code-recovery and eval-CLI tests."""
    from tests.test_loaders import _make_blender
    tmp = tmp_path_factory.mktemp("app_refine")
    root = _make_blender(tmp / "scene", n_frames=3, size=16)
    out = tmp / "exp"
    argv = ["--data_root", str(root), "--out_dir", str(out),
            "--data_kind", "blender", "--appearance_dim", "4",
            "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
            "--rays_per_batch", "64", "--nc", "8", "--nf", "8",
            "--eval_chunk", "256", "--white_bkgd", "true",
            "--mesh_devices", "1"]
    from nerf_sandbox_tpu.scripts.train_nerf import main
    main(argv + ["--max_steps", "40", "--ckpt_every", "40",
                 "--log_every", "40", "--num_val_steps", "1",
                 "--progress_frames", "0"])
    from nerf_sandbox_tpu.config import (apply_path_defaults,
                                         build_argparser, make_cfg_from_args)
    from nerf_sandbox_tpu.train.trainer import Trainer
    cfg = apply_path_defaults(
        make_cfg_from_args(build_argparser().parse_args(argv)), "blender")
    tr = Trainer(cfg)
    tr.load_latest_checkpoint(load_optim=False)
    return tr, cfg


def test_appearance_refiner_recovers_code(app_refine_setup):
    """gt rendered with a TARGET code c*: refining from the zero code must
    reduce the photometric surrogate AND make the full render measurably
    closer to gt than the zero-code render."""
    tr, cfg = app_refine_setup
    from nerf_sandbox_tpu.render.app_refine import make_appearance_refiner
    fr = tr.scene_val.frames[0]
    K = np.asarray(fr.K, np.float32)
    c_star = np.array([1.0, -1.0, 0.5, -0.5], np.float32)
    pf_star, _ = fold_appearance(tr.state.params_f, tr.model_cfg, c_star)
    pc, _ = tr.eval_params()
    gt = np.asarray(tr.valr._render_pose(pc, pf_star, fr.c2w, fr.H, fr.W,
                                         K)["rgb"])
    code0 = np.zeros(4, np.float32)
    refiner = make_appearance_refiner(
        tr.eval_hyper, tr.pos_bands, tr.dir_bands, model_cfg=tr.model_cfg,
        params_f_raw=tr.state.params_f, code0=code0)
    folded, info = refiner(fr.c2w, K, fr.H, fr.W, gt, steps=100, lr=5e-2,
                           rays=256, seed=0)
    assert np.isfinite(info["mse_init"]) and np.isfinite(info["mse_final"])
    assert info["mse_final"] < info["mse_init"], info
    assert info["code_delta_norm"] > 1e-3
    pf0, _ = fold_appearance(tr.state.params_f, tr.model_cfg, code0)
    r0 = np.asarray(tr.valr._render_pose(pc, pf0, fr.c2w, fr.H, fr.W,
                                         K)["rgb"])
    r1 = np.asarray(tr.valr._render_pose(pc, folded, fr.c2w, fr.H, fr.W,
                                         K)["rgb"])
    mse0 = float(np.mean((r0 - gt) ** 2))
    mse1 = float(np.mean((r1 - gt) ** 2))
    assert mse1 < 0.5 * mse0, (mse1, mse0)


def test_eval_nerf_refine_appearance_cli(app_refine_setup):
    """nerf-tpu-eval --refine_appearance: metrics.json carries the
    half-image protocol fields; a code-free run fails loudly."""
    tr, cfg = app_refine_setup
    from pathlib import Path

    from nerf_sandbox_tpu.scripts.eval_nerf import main as eval_main
    out = Path(cfg.out_dir)
    eval_main(["--data_root", cfg.data_root, "--out_dir", str(out),
               "--split", "train", "--indices", "0", "--no_images",
               "--eval_out", str(out / "eval_app"),
               "--refine_appearance", "10",
               "--refine_appearance_rays", "64"])
    m = json.loads((out / "eval_app" / "metrics.json").read_text())
    assert "psnr_heldout_half_mean" in m
    # the refined-protocol flag + primary-metric semantics (ADVICE r4):
    # psnr must BE the heldout-half number, not the contaminated full image
    assert m.get("appearance_refined") is True
    assert "psnr_full_refined_mean" in m
    rec = m["frames"][0]
    assert np.isfinite(rec["psnr_heldout_half"])
    assert rec["psnr"] == rec["psnr_heldout_half"]
    assert "psnr_full_refined" in rec
    ar = rec["app_refine"]
    assert np.isfinite(ar["mse_final"]) and np.isfinite(ar["mse_init"])
