"""Async validation (--async_val): the worker thread renders from a params
snapshot captured at the scheduled step, so its artifacts must be
bit-identical to the synchronous path's (reference blocking behavior:
nerf_sandbox/source/train/trainer.py:790-831)."""

from pathlib import Path

from tests.test_loaders import _make_blender


def _run(root, out, async_val: bool):
    from nerf_sandbox_tpu.scripts.train_nerf import main
    main(["--data_root", str(root), "--out_dir", str(out),
          "--data_kind", "blender", "--max_steps", "8",
          "--rays_per_batch", "64", "--nc", "8", "--nf", "8",
          "--num_val_steps", "2", "--ckpt_every", "8", "--log_every", "4",
          "--white_bkgd", "true", "--seed", "3",
          "--progress_video_during_training", "--progress_frames", "4",
          "--eval_chunk", "256", "--async_val", str(async_val).lower()])


def test_async_val_matches_sync(tmp_path_factory):
    root = _make_blender(tmp_path_factory.mktemp("data") / "scene",
                         n_frames=3, size=16)
    out_a = tmp_path_factory.mktemp("runs") / "async"
    out_s = tmp_path_factory.mktemp("runs") / "sync"
    _run(root, out_a, async_val=True)
    _run(root, out_s, async_val=False)

    a_pngs = sorted((out_a / "validation").rglob("*.png"))
    s_pngs = sorted((out_s / "validation").rglob("*.png"))
    rel_a = [p.relative_to(out_a) for p in a_pngs]
    rel_s = [p.relative_to(out_s) for p in s_pngs]
    assert rel_a == rel_s and len(rel_a) > 0, (rel_a, rel_s)
    for ra in rel_a:
        assert (out_a / ra).read_bytes() == (out_s / ra).read_bytes(), \
            f"async/sync artifact mismatch: {ra}"


def test_async_val_drains_before_exports(tmp_path_factory):
    """The final scheduled validation (at max_steps) must complete before
    the post-training video export reads its PNGs."""
    root = _make_blender(tmp_path_factory.mktemp("data") / "scene",
                         n_frames=3, size=16)
    out = tmp_path_factory.mktemp("runs") / "drain"
    _run(root, out, async_val=True)
    # final-step triplet exists and the per-index time-lapse was assembled
    rgb = list((out / "validation" / "val_idx0000" / "rgb").glob("step_*.png"))
    assert any(p.name == "step_0000008.png" for p in rgb), rgb
    vids = list((out / "validation" / "val_idx0000").glob("val_idx0000_rgb.*"))
    assert vids, "export ran before the async queue drained"
