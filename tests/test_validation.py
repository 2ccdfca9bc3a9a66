"""ValidationRenderer unit tests: snapping, PSNR, index resolution,
progress-plan blocks and resume semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_sandbox_tpu.core.encoding import vanilla_encoders
from nerf_sandbox_tpu.config import Config
from nerf_sandbox_tpu.data.scene import Frame, Scene
from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
from nerf_sandbox_tpu.render.renderer import EvalHyper, make_tile_renderer
from nerf_sandbox_tpu.render.validation import (
    ValidationRenderer, compute_psnr, compute_ssim, snap_hwk)


def test_snap_hwk():
    K = np.array([[10.0, 0, 5], [0, 10.0, 4], [0, 0, 1]], np.float32)
    H, W, K2 = snap_hwk(10, 9, K, 16)
    assert (H, W) == (16, 16)
    np.testing.assert_allclose(K2[0, 0], 10.0 * 16 / 9)
    np.testing.assert_allclose(K2[1, 1], 10.0 * 16 / 10)
    H, W, K3 = snap_hwk(32, 16, K, 16)
    assert (H, W) == (32, 16) and K3 is K


def test_compute_psnr():
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 0.1)
    np.testing.assert_allclose(compute_psnr(a, b), 20.0, rtol=1e-5)
    assert compute_psnr(a, a) == pytest.approx(100.0)
    # masked: only count half the pixels (the differing half)
    mask = np.zeros((4, 4, 1))
    mask[:2] = 1.0
    c = a.copy()
    c[2:] = 1.0   # error only outside the mask
    assert compute_psnr(a, c, mask) == pytest.approx(100.0)


def _ssim_windows_ref(p, g, size=11, sigma=1.5):
    """Brute-force SSIM oracle: explicit Gaussian-weighted valid windows."""
    x = np.arange(size) - (size - 1) / 2
    k1 = np.exp(-0.5 * (x / sigma) ** 2)
    k1 /= k1.sum()
    K = np.outer(k1, k1)
    H, W, C = p.shape
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    vals = []
    for i in range(H - size + 1):
        for j in range(W - size + 1):
            for c in range(C):
                wp = p[i:i + size, j:j + size, c]
                wg = g[i:i + size, j:j + size, c]
                mp, mg = (K * wp).sum(), (K * wg).sum()
                vp = (K * wp * wp).sum() - mp * mp
                vg = (K * wg * wg).sum() - mg * mg
                cov = (K * wp * wg).sum() - mp * mg
                vals.append(((2 * mp * mg + c1) * (2 * cov + c2))
                            / ((mp * mp + mg * mg + c1) * (vp + vg + c2)))
    return float(np.mean(vals))


def test_compute_ssim():
    rng = np.random.RandomState(3)
    a = rng.uniform(0, 1, (20, 22, 3))
    assert compute_ssim(a, a) == pytest.approx(1.0)
    # matches the explicit windowed oracle
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1)
    assert compute_ssim(a, b) == pytest.approx(_ssim_windows_ref(a, b),
                                               abs=1e-10)
    # monotone in degradation
    c = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1)
    assert compute_ssim(a, c) < compute_ssim(a, b) < 1.0
    # masked: error confined outside the mask scores ~1 under the mask
    mask = np.zeros((20, 22, 1))
    mask[:, :11] = 1.0
    d = a.copy()
    d[:, 16:] = 0.0   # corruption fully outside every window under the mask
    # (valid-region crop removes 5 columns each side; masked columns 0..10
    # crop to 0..5, whose 11-wide windows span columns 0..15 < 16)
    assert compute_ssim(a, d, mask) == pytest.approx(1.0)
    assert compute_ssim(a, d) < 0.999


def _valr(tmp_path, n_frames=3, rgba=True):
    rng = np.random.RandomState(0)
    K = np.array([[12.0, 0, 8], [0, 12.0, 8], [0, 0, 1]], np.float32)
    frames = []
    for i in range(n_frames):
        c = 4 if rgba else 3
        img = rng.uniform(0, 1, (16, 16, c)).astype(np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0, 0, 4.0]
        frames.append(Frame(image=img, K=K, c2w=c2w,
                            meta={"file_path": f"/x/r_{i}.png",
                                  "basename": f"r_{i}.png"}))
    scene = Scene(frames=frames)
    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=32, skip_pos=1)
    pos_b, dir_b = vanilla_encoders()
    tile = make_tile_renderer(
        EvalHyper(model=model, nc_eval=4, nf_eval=4, samp_near=2.0, samp_far=6.0),
        jnp.asarray(pos_b), jnp.asarray(dir_b))
    cfg = Config(out_dir=str(tmp_path), progress_frames=6, path_type="blender",
                 bl_phi_deg=-30.0, bl_rots=1.0, bl_theta_start_deg=-180.0)
    valr = ValidationRenderer(
        scene_val=scene, out_dir=tmp_path / "validation", render_tile=tile,
        cfg=cfg, near_world=2.0, far_world=6.0, use_ndc=False,
        ndc_near_plane_world=2.0, eval_chunk=256)
    pc = init_nerf_params(jax.random.PRNGKey(0), model)
    pf = init_nerf_params(jax.random.PRNGKey(1), model)
    return valr, pc, pf


def test_resolve_indices_by_filename(tmp_path):
    valr, _, _ = _valr(tmp_path)
    assert valr._resolve_frame_indices(None, ["r_1.png"]) == [1]
    assert valr._resolve_frame_indices([2], ["r_0"]) == [0, 2]
    with pytest.raises(ValueError):
        valr._resolve_frame_indices(None, ["nope.png"])
    # out-of-range indices clamp
    assert valr._resolve_frame_indices([99]) == [2]


def test_render_indices_and_psnr(tmp_path):
    valr, pc, pf = _valr(tmp_path)
    paths, metrics = valr.render_indices_at_step(7, [0, 1], pc, pf)
    assert len(paths) == 6
    assert (tmp_path / "validation" / "val_idx0000" / "rgb"
            / "step_0000007.png").exists()
    assert metrics["psnr_mean"] is not None
    assert len(metrics["psnr_per_frame"]) == 2
    assert metrics["ssim_mean"] is not None
    assert len(metrics["ssim_per_frame"]) == 2
    assert all(-1.0 <= s <= 1.0 for s in metrics["ssim_per_frame"])


def test_progress_blocks_and_resume(tmp_path):
    valr, pc, pf = _valr(tmp_path)
    valr.setup_progress_plan(val_steps=[5, 10, 20])
    assert sum(valr._prog_block_sizes) == 6 and len(valr._prog_block_sizes) == 3
    start, count = valr.render_progress_block(pc, pf)
    assert (start, count) == (0, 2)
    rgb_dir = valr._prog_frames_dir / "rgb"
    assert len(list(rgb_dir.glob("rgb_frame_*.png"))) == 2

    # resume: 1 event passed + 1 block on disk → next block idx = 1
    valr._prog_next_block_idx = 0
    valr.resume_to_step(5)
    assert valr._prog_next_block_idx == 1

    # render remaining blocks; existing frames are skipped (idempotent)
    valr.render_progress_block(pc, pf)
    valr.render_progress_block(pc, pf)
    assert len(list(rgb_dir.glob("rgb_frame_*.png"))) == 6
    # exhausted plan → (0, 0)
    assert valr.render_progress_block(pc, pf) == (0, 0)

    valr.export_progress_video()
    vids = list(valr._prog_frames_dir.glob("training_progress_*.*"))
    assert vids


def test_scored_renders_use_scored_tile(tmp_path):
    """--val_exact routing: PSNR-scored renders (render_indices_at_step,
    evaluate_split) must go through ``render_tile_scored`` (exact XLA when
    the trainer runs the fused kernel — measured 0.26-1.69 dB scored gap,
    RESULTS.md 'Scored-eval path'), while progress-video blocks keep the
    throughput ``render_tile``."""
    valr, pc, pf = _valr(tmp_path)
    calls = {"scored": 0, "fast": 0}
    base = valr.render_tile

    def fast(*a, **k):
        calls["fast"] += 1
        return base(*a, **k)

    def scored(*a, **k):
        calls["scored"] += 1
        return base(*a, **k)

    valr.render_tile = fast
    valr.render_tile_scored = scored

    valr.render_indices_at_step(7, [0], pc, pf)
    assert calls["scored"] > 0 and calls["fast"] == 0

    valr.evaluate_split(pc, pf, save_images=False)
    n_scored = calls["scored"]
    assert n_scored > 0 and calls["fast"] == 0

    valr.setup_progress_plan(val_steps=[5, 10, 20])
    valr.render_progress_block(pc, pf)
    assert calls["fast"] > 0 and calls["scored"] == n_scored

    # default wiring: absent a scored renderer, both names share one tile
    from nerf_sandbox_tpu.render.validation import ValidationRenderer
    v2 = ValidationRenderer(
        scene_val=valr.scene, out_dir=tmp_path / "v2", render_tile=base,
        cfg=valr.cfg, near_world=2.0, far_world=6.0, use_ndc=False,
        ndc_near_plane_world=2.0, eval_chunk=256)
    assert v2.render_tile_scored is v2.render_tile


def test_render_selected_frames(tmp_path):
    valr, pc, pf = _valr(tmp_path)
    out = valr.render_selected_frames(pc, pf, frame_indices=[1], res_scale=0.5)
    assert len(out) == 3
    import imageio.v2 as imageio
    img = imageio.imread(out[0])
    assert img.shape[:2] == (8, 8)


def test_masked_psnr_auto_and_override(tmp_path):
    """use_mask='auto' = not composite_on_load (reference
    validation_renderer.py:505-522): with white_bkgd=False and RGBA GT the
    primary PSNR is alpha-masked; both variants are always reported."""
    valr, pc, pf = _valr(tmp_path)            # RGBA frames, white_bkgd=False
    assert not valr.cfg.white_bkgd
    _, m = valr.render_indices_at_step(3, [0], pc, pf, use_mask="auto")
    pm, pu = m["psnr_masked_per_frame"][0], m["psnr_unmasked_per_frame"][0]
    assert pm is not None and pu is not None
    assert abs(pm - pu) > 1e-6                # mask actually changes the metric
    assert m["psnr_per_frame"][0] == pm       # auto → masked primary

    # explicit override: use_mask=False → unmasked primary
    _, m2 = valr.render_indices_at_step(4, [0], pc, pf, use_mask=False)
    assert m2["psnr_per_frame"][0] == m2["psnr_unmasked_per_frame"][0]

    # white_bkgd=True (composited on load) → auto resolves to unmasked
    valr.cfg.white_bkgd = True
    _, m3 = valr.render_indices_at_step(5, [0], pc, pf, use_mask="auto")
    assert m3["psnr_per_frame"][0] == m3["psnr_unmasked_per_frame"][0]
