"""Eval quality-neutrality pin (VERDICT r2 #7).

The fast eval path (fused Pallas ray-march + early ray termination +
fine-ray culling — the TPU defaults, config.py `--eval_ert_eps`) must stay
quality-neutral vs the XLA refine-all reference path
(``render_utils.py:285-417`` semantics) on a TRAINED model, where ERT and
culling actually engage (saturated opacity, empty background rays).  The
round-2 measurement (RESULTS.md "eval quality") found ERT bit-identical and
fused-vs-XLA within bf16 tolerance; this test pins that so future kernel
edits cannot silently regress it.  Runs the kernel in interpret mode on CPU.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sandbox_tpu.core.encoding import vanilla_encoders
from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
from nerf_sandbox_tpu.models.mlp import NeRFConfig
from nerf_sandbox_tpu.render.renderer import EvalHyper, make_tile_renderer, render_pose
from nerf_sandbox_tpu.train.step import (
    TrainHyper, build_train_step, init_train_state, make_optimizer)

SIZE = 32
NEAR, FAR = 2.0, 6.0
# 3 layers: the fused kernel's packed-weight layout needs >=1 plain mid
# layer (fused_mlp.py pack_nerf_params) — first + skip + mid is the minimum
MODEL = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=3,
                   hidden_dim=64, skip_pos=1)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Short real training run on the textured sphere scene → params + a
    held-out (c2w, GT-on-white) pair."""
    from tests.make_sphere_scene import make_scene
    from nerf_sandbox_tpu.data.blender_loader import BlenderSceneLoader

    root = make_scene(tmp_path_factory.mktemp("scene"), views=8, size=SIZE,
                      textured=True, val_views=1)
    loader = BlenderSceneLoader(root)
    scene_tr = loader.load("train")
    scene_val = loader.load("val")

    arrs = SceneArrays.from_scene(scene_tr)
    hyper = TrainHyper(model=MODEL, nc=16, nf=32, samp_near=NEAR,
                       samp_far=FAR, raw_noise_std=0.0)
    spec = RayBatchSpec(rays_per_batch=512, image_h=SIZE, image_w=SIZE)
    tx = make_optimizer(5e-3, "none", {})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=NEAR, far=FAR)
    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b))
    for _ in range(400):
        state, m = step_fn(state, arrs)
    # loss = MSE(coarse) + MSE(fine); 0.04 total ≈ 17 dB/head — enough
    # structure for ERT/culling to engage on a saturated sphere
    assert float(m["loss"]) < 0.04, "fixture model failed to train"

    vf = scene_val.frames[0]
    img = np.asarray(vf.image, np.float32)
    if img.dtype == np.uint8 or img.max() > 1.5:
        img = img / 255.0
    gt = img[..., :3] * img[..., 3:4] + (1.0 - img[..., 3:4])  # on white
    return {"params_c": state.params_c, "params_f": state.params_f,
            "c2w": vf.c2w, "K": vf.K, "gt": gt,
            "pos_b": jnp.asarray(pos_b), "dir_b": jnp.asarray(dir_b)}


def _render(trained, **overrides):
    hyper = EvalHyper(model=MODEL, nc_eval=16, nf_eval=32,
                      samp_near=NEAR, samp_far=FAR)._replace(**overrides)
    tile = make_tile_renderer(hyper, trained["pos_b"], trained["dir_b"])
    out = render_pose(tile, trained["params_c"], trained["params_f"],
                      trained["c2w"], SIZE, SIZE, trained["K"],
                      eval_chunk=256)
    return out["rgb"]


def test_fast_eval_defaults_are_quality_neutral(trained):
    """The TPU eval defaults — fused Pallas kernel + ERT(1e-4), with
    eval_fine_frac at its 1.0 default — match the XLA refine-all path.
    (r2 measured: fused within bf16 tolerance, ERT bit-identical.)"""
    ref = _render(trained)                     # XLA, refine-all, no ERT
    fused = _render(trained, use_pallas=True, pallas_interpret=True)
    fast = _render(trained, use_pallas=True, pallas_interpret=True,
                   eval_ert_eps=1e-4)

    psnr_ref = _psnr(ref, trained["gt"])
    psnr_fast = _psnr(fast, trained["gt"])
    # sanity: the fixture actually learned the scene
    assert psnr_ref > 14.0, f"fixture under-trained: {psnr_ref:.2f} dB"
    # the pin: stated tolerance 0.05 dB (measured here: +0.0015 dB)
    assert abs(psnr_fast - psnr_ref) < 0.05, \
        f"fast-eval PSNR drift: ref={psnr_ref:.3f} fast={psnr_fast:.3f}"
    # pixelwise: bf16 accumulation-order + ERT eps bound only
    assert float(np.abs(fast - ref).max()) < 2.5e-2
    # ERT's dropped tail is below fp32 resolution on saturated rays
    # (r2 measurement: bit-identical; allow one ulp of drift)
    np.testing.assert_allclose(fast, fused, atol=1e-6)


def test_cull_is_exact_per_ray(trained):
    """eval_fine_frac's contract: every pixel equals EITHER the refine-all
    result (refined rays) OR the coarse-only result (culled rays) — culling
    never invents a third value. Its PSNR effect is scene-dependent (a
    dense tile culls occupied rays), which is why the default stays 1.0;
    quality-positive use is measured in RESULTS.md, not pinned here."""
    ref = _render(trained)                       # refine-all
    coarse = _render(trained, nf_eval=0)         # coarse composite only
    culled = _render(trained, eval_fine_frac=0.5)

    match_ref = np.all(np.abs(culled - ref) < 1e-6, axis=-1)
    match_coarse = np.all(np.abs(culled - coarse) < 1e-6, axis=-1)
    assert np.all(match_ref | match_coarse), \
        f"{int((~(match_ref | match_coarse)).sum())} pixels match neither path"
    # and the cull actually did something both ways on this dense scene
    assert match_ref.mean() > 0.3 and match_coarse.mean() > 0.2


def test_kplanes_fused_render_matches_xla():
    """Renderer-level wiring of the in-kernel kplanes encode: the fused
    tile renderer == the XLA path on a kplanes model (random-init params;
    the op-level equivalence is pinned in test_fused_raymarch)."""
    from nerf_sandbox_tpu.models.kplanes import (KPlanesConfig,
                                                 init_kplanes_params)
    from nerf_sandbox_tpu.models.mlp import init_nerf_params
    from nerf_sandbox_tpu.models.occupancy import OccupancyConfig
    kp_cfg = KPlanesConfig(plane_res=(8, 16), plane_features=4, line_res=32,
                           line_features=8, aabb_scale=2.0)
    model = NeRFConfig(enc_pos_dim=kp_cfg.out_dim, enc_dir_dim=27,
                       n_layers=3, hidden_dim=128, skip_pos=1)
    k = jax.random.PRNGKey(3)
    pf = init_nerf_params(k, model)
    pf["pos_grid"] = init_kplanes_params(jax.random.fold_in(k, 1), kp_cfg)
    pos_b, dir_b = vanilla_encoders()

    # occupancy mode (the flagship kplanes+occupancy config): z placement
    # is deterministic from the shared grid, so the comparison isolates
    # the forward itself (hierarchical mode would amplify bf16 sigma
    # diffs through the resample bins)
    occ = OccupancyConfig(resolution=16)
    pc = jnp.ones((16 ** 3,), jnp.float32)      # all-occupied grid
    # infinite_last_bin off: with RANDOM-init params the last sample's
    # sigma sits at the relu knife edge, and dt=1e10 amplifies a one-ulp
    # bf16 sign flip into weight 0 vs 0.79 (trained models keep
    # background sigma decisively negative; the trained-fixture test
    # above pins the default bin semantics for the freq kernel)
    base = dict(model=model, nc_eval=8, nf_eval=16, samp_near=NEAR,
                samp_far=FAR, pos_encoder="kplanes", enc_cfg=kp_cfg,
                sampling_mode="occupancy", occ_cfg=occ,
                infinite_last_bin=False)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    K = np.array([[24.0, 0, SIZE / 2], [0, 24.0, SIZE / 2], [0, 0, 1]],
                 np.float32)

    def rend(**ov):
        hyper = EvalHyper(**base)._replace(**ov)
        tile = make_tile_renderer(hyper, jnp.asarray(pos_b),
                                  jnp.asarray(dir_b))
        return render_pose(tile, pc, pf, c2w, SIZE, SIZE, K,
                           eval_chunk=256)["rgb"]

    ref = rend()
    fused = rend(use_pallas=True, pallas_interpret=True)
    # 3.5e-2: the kernel computes interp hat weights in bf16 (the same
    # dtype the XLA eval path uses, but rounded at different points) —
    # measured max |Δ| 0.026 on random-init params
    assert float(np.abs(fused - ref).max()) < 3.5e-2


def test_kplanes_dynamic_fused_render_matches_xla():
    """Renderer-level 4-D kplanes at a fixed frame time: the fused tile
    renderer (time planes folded in-kernel at t) == the XLA 4-D path,
    and the fold actually responds to time (t=0 render != t=1 render)."""
    from nerf_sandbox_tpu.models.kplanes import (KPlanesConfig,
                                                 init_kplanes_params)
    from nerf_sandbox_tpu.models.mlp import init_nerf_params
    from nerf_sandbox_tpu.models.occupancy import OccupancyConfig
    kp_cfg = KPlanesConfig(plane_res=(8, 16), plane_features=4, line_res=32,
                           line_features=8, aabb_scale=2.0, time_res=6)
    model = NeRFConfig(enc_pos_dim=kp_cfg.out_dim, enc_dir_dim=27,
                       n_layers=3, hidden_dim=128, skip_pos=1)
    k = jax.random.PRNGKey(5)
    pf = init_nerf_params(k, model)
    pf["pos_grid"] = init_kplanes_params(jax.random.fold_in(k, 1), kp_cfg)
    for s in range(2):
        for di, nm in enumerate(("xt", "yt", "zt")):
            key = f"plane{s}_{nm}"
            pf["pos_grid"][key] = pf["pos_grid"][key] + \
                0.3 * jax.random.normal(jax.random.fold_in(k, 21 + 3 * s + di),
                                        pf["pos_grid"][key].shape)
    pos_b, dir_b = vanilla_encoders()
    occ = OccupancyConfig(resolution=16)
    pc = jnp.ones((16 ** 3,), jnp.float32)
    base = dict(model=model, nc_eval=8, nf_eval=16, samp_near=NEAR,
                samp_far=FAR, pos_encoder="kplanes", enc_cfg=kp_cfg,
                sampling_mode="occupancy", occ_cfg=occ,
                infinite_last_bin=False)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    K = np.array([[24.0, 0, SIZE / 2], [0, 24.0, SIZE / 2], [0, 0, 1]],
                 np.float32)

    def rend(time, **ov):
        hyper = EvalHyper(**base)._replace(**ov)
        tile = make_tile_renderer(hyper, jnp.asarray(pos_b),
                                  jnp.asarray(dir_b))
        return render_pose(tile, pc, pf, c2w, SIZE, SIZE, K,
                           eval_chunk=256, time=time)["rgb"]

    ref = rend(0.37)
    fused = rend(0.37, use_pallas=True, pallas_interpret=True)
    assert float(np.abs(fused - ref).max()) < 2.5e-2
    other = rend(0.9, use_pallas=True, pallas_interpret=True)
    assert float(np.abs(other - fused).max()) > 5e-2, \
        "time fold ignored the frame time"
