"""Checkpoint save / discovery / restore round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.models.mlp import NeRFConfig
from nerf_sandbox_tpu.train.checkpoints import (
    find_latest_checkpoint, load_checkpoint, save_checkpoint)
from nerf_sandbox_tpu.train.step import TrainHyper, init_train_state, make_optimizer


def _state(seed=0):
    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                       hidden_dim=32, skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=8)
    tx = make_optimizer(1e-3, "none", {})
    return init_train_state(jax.random.PRNGKey(seed), hyper, tx,
                            near=2.0, far=6.0), tx


def test_roundtrip(tmp_path):
    state, _ = _state()
    state = state._replace(step=jnp.int32(123))
    save_checkpoint(tmp_path, 123, state, {"lr": 5e-4})

    fresh, _ = _state(seed=99)
    restored, step, cfg = load_checkpoint(tmp_path / "ckpt_0000123.ckpt", fresh)
    assert step == 123 and cfg["lr"] == 5e-4
    for a, b in zip(jax.tree_util.tree_leaves(restored.params_c),
                    jax.tree_util.tree_leaves(state.params_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 123


def test_latest_discovery_and_symlink(tmp_path):
    state, _ = _state()
    save_checkpoint(tmp_path, 100, state, {})
    save_checkpoint(tmp_path, 250, state, {})
    save_checkpoint(tmp_path, 50, state, {})
    latest = find_latest_checkpoint(tmp_path)
    assert latest.name == "ckpt_0000250.ckpt"
    assert (tmp_path / "ckpt_latest.ckpt").exists()


def test_tagged_checkpoint(tmp_path):
    state, _ = _state()
    p = save_checkpoint(tmp_path, 7, state, {}, tag="interrupt_step_7")
    assert p.name == "interrupt_step_7.ckpt"


def test_orbax_backend_roundtrip(tmp_path):
    import jax.numpy as jnp
    from nerf_sandbox_tpu.train.checkpoints import OrbaxCheckpointer
    state, _ = _state()
    state = state._replace(step=jnp.int32(42))
    mgr = OrbaxCheckpointer(tmp_path / "orbax")
    grid = np.arange(8.0, dtype=np.float32)
    mgr.save(42, state, {"lr": 1e-3}, extra={"occ_grid": grid})
    mgr.mgr.wait_until_finished()
    assert mgr.latest_step() == 42

    fresh, _ = _state(seed=7)
    restored, step, extras = mgr.restore(
        42, fresh, extra_template={"occ_grid": np.zeros(8, np.float32)})
    assert step == 42
    np.testing.assert_array_equal(extras["occ_grid"], grid)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params_f),
                    jax.tree_util.tree_leaves(state.params_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # asking for extras from a checkpoint that lacks them degrades cleanly
    mgr.save(43, state._replace(step=jnp.int32(43)), {"lr": 1e-3})
    mgr.mgr.wait_until_finished()
    _, step2, extras2 = mgr.restore(
        43, fresh, extra_template={"occ_grid": np.zeros(8, np.float32)})
    assert step2 == 43 and extras2 == {}
    # ...and the inverse subset: a checkpoint WITH extras restores into a
    # run that passes no template (e.g. resuming an occupancy checkpoint
    # under --sampling hierarchical) — state restores, extras come back
    # shaped from the checkpoint's own metadata
    restored3, step3, extras3 = mgr.restore(42, fresh)
    assert step3 == 42
    np.testing.assert_array_equal(extras3["occ_grid"], grid)
    for a, b in zip(jax.tree_util.tree_leaves(restored3.params_f),
                    jax.tree_util.tree_leaves(state.params_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_orbax_cli_resume(tmp_path):
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    base = ["--data_root", str(scene), "--out_dir", str(out),
            "--data_kind", "blender", "--ckpt_backend", "orbax",
            "--max_steps", "4", "--rays_per_batch", "32", "--nc", "4",
            "--nf", "4", "--num_val_steps", "1", "--ckpt_every", "2",
            "--log_every", "2", "--progress_frames", "2",
            "--eval_chunk", "128"]
    main(base)
    base[base.index("--max_steps") + 1] = "6"
    main(base + ["--auto_resume"])
    # steps 2,4 from run 1 and 6 from run 2 present
    import orbax.checkpoint as ocp
    with ocp.CheckpointManager(out / "checkpoints") as m:
        assert 6 in m.all_steps() and 4 in m.all_steps()


def test_resume_no_optim(tmp_path):
    state, tx = _state()
    # perturb optimizer state by one update so it differs from fresh
    grads = jax.tree_util.tree_map(
        jnp.ones_like, {"c": state.params_c, "f": state.params_f})
    _, opt_state = tx.update(grads, state.opt_state,
                             {"c": state.params_c, "f": state.params_f})
    state = state._replace(opt_state=opt_state)
    save_checkpoint(tmp_path, 5, state, {})

    fresh, _ = _state(seed=1)
    restored, _, _ = load_checkpoint(tmp_path / "ckpt_0000005.ckpt", fresh,
                                     load_optim=False)
    # opt state untouched (left as the fresh template's)
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(fresh.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_restore_mismatch(tmp_path):
    """A ckpt saved under a different architecture must not silently resume
    a partially random model (ADVICE r1): raise unless allow_partial."""
    import pytest
    state, _ = _state()
    save_checkpoint(tmp_path, 9, state, {})

    # template with one extra trunk layer → template keys missing from file
    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=3,
                       hidden_dim=32, skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=8)
    tx = make_optimizer(1e-3, "none", {})
    fresh = init_train_state(jax.random.PRNGKey(5), hyper, tx,
                             near=2.0, far=6.0)
    with pytest.raises(ValueError, match="key mismatch"):
        load_checkpoint(tmp_path / "ckpt_0000009.ckpt", fresh)

    restored, step, _ = load_checkpoint(tmp_path / "ckpt_0000009.ckpt", fresh,
                                        allow_partial=True)
    assert step == 9


def test_orbax_resume_prefers_newer_tagged_npz(tmp_path, capsys):
    """Signal checkpoints are tagged .npz even under --ckpt_backend orbax;
    --auto_resume must pick whichever source has the higher step (ADVICE r1)."""
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    base = ["--data_root", str(scene), "--out_dir", str(out),
            "--data_kind", "blender", "--ckpt_backend", "orbax",
            "--max_steps", "4", "--rays_per_batch", "32", "--nc", "4",
            "--nf", "4", "--num_val_steps", "1", "--ckpt_every", "2",
            "--log_every", "2", "--progress_frames", "2",
            "--eval_chunk", "128"]
    main(base)          # orbax saves at steps 2, 4

    # simulate an interrupt save AFTER the last orbax save
    state, _ = _state()
    state = state._replace(step=jnp.int32(5))
    save_checkpoint(out / "checkpoints", 5, state, {},
                    tag="interrupt_step_5", latest=False)

    capsys.readouterr()
    base[base.index("--max_steps") + 1] = "6"
    main(base + ["--auto_resume", "--allow_partial_restore"])
    assert "Resuming from step 6" in capsys.readouterr().out
