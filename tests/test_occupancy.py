"""Occupancy-grid sampling tests: lookup semantics, EMA update, training
convergence, and CLI integration."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.models.occupancy import (
    OccupancyConfig, grid_values, init_occupancy_grid, make_occupancy_updater,
    ray_probe_weights)

CFG = OccupancyConfig(resolution=8, lo=(-1.0, -1.0, -1.0), hi=(1.0, 1.0, 1.0),
                      n_probes=16, explore_frac=0.0)


def test_grid_lookup_cells_and_bounds():
    R = CFG.resolution
    grid = jnp.arange(R ** 3, dtype=jnp.float32)
    # center of cell (0,0,0) is at lo + half cell
    p000 = jnp.array([[-1.0 + 0.124, -1.0 + 0.124, -1.0 + 0.124]])
    np.testing.assert_allclose(np.asarray(grid_values(grid, CFG, p000)), [0.0])
    # cell (1,2,3) → flat (1*8+2)*8+3 = 83
    p = jnp.array([[-1.0 + 1.5 * 0.25, -1.0 + 2.5 * 0.25, -1.0 + 3.5 * 0.25]])
    np.testing.assert_allclose(np.asarray(grid_values(grid, CFG, p)), [83.0])
    # outside the box → 0
    pout = jnp.array([[2.0, 0.0, 0.0], [0.0, -5.0, 0.0]])
    np.testing.assert_allclose(np.asarray(grid_values(grid, CFG, pout)), [0, 0])


def test_probe_weights_follow_grid():
    R = CFG.resolution
    grid = jnp.zeros((R ** 3,))
    # occupy only the central slab z in [-0.25, 0)
    idx = jnp.arange(R ** 3)
    zc = idx % R
    grid = jnp.where(zc == 3, 100.0, grid)
    # ray marching +z through the box center
    o = jnp.array([[0.01, 0.01, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    z, w = ray_probe_weights(grid, CFG, o, d, jnp.ones((1, 1)), 1.0, 3.0)
    w = np.asarray(w[0])
    z = np.asarray(z[0])
    # mass concentrated where the ray crosses the occupied slab
    hot = z[np.argmax(w)] - 2.0   # world z of the hottest probe
    assert -0.25 <= hot < 0.05
    assert w.max() > 10 * (w.min() + 1e-9)


def test_uniform_grid_gives_uniform_weights():
    grid = init_occupancy_grid(CFG)
    o = jnp.zeros((4, 3))
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
    z, w = ray_probe_weights(grid, CFG, o, d, jnp.ones((4, 1)), 0.0, 0.9)
    w = np.asarray(w)
    np.testing.assert_allclose(w, w[0, 0], rtol=1e-5)


def test_probe_weights_uniform_blend():
    """Annealed explore floor: blend=1 → exactly stratified regardless of
    the grid; blend=0 → the grid-driven profile; blend=0.5 in between,
    normalized mass preserved."""
    R = CFG.resolution
    grid = jnp.zeros((R ** 3,))
    grid = jnp.where(jnp.arange(R ** 3) % R == 3, 100.0, grid)
    o = jnp.array([[0.01, 0.01, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    args = (grid, CFG, o, d, jnp.ones((1, 1)), 1.0, 3.0)

    _, w_base = ray_probe_weights(*args)
    _, w0 = ray_probe_weights(*args, uniform_blend=jnp.float32(0.0))
    _, w1 = ray_probe_weights(*args, uniform_blend=jnp.float32(1.0))
    _, wh = ray_probe_weights(*args, uniform_blend=jnp.float32(0.5))

    base = np.asarray(w_base)
    mean = base.mean(axis=-1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(w0), base)   # bit-exact at 0
    np.testing.assert_allclose(np.asarray(w1),
                               np.broadcast_to(mean, base.shape), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(wh), 0.5 * base + 0.5 * mean,
                               rtol=1e-6)
    # total mass preserved at every blend
    for w in (w0, w1, wh):
        np.testing.assert_allclose(float(jnp.sum(w)), float(base.sum()),
                                   rtol=1e-6)


def test_occ_explore_anneal_train_step():
    """--occ_explore_anneal: the annealed step runs and differs from the
    non-annealed step early (blend>0 changes sample placement), and
    matches it bit-exactly once past the anneal horizon (blend clamps
    to 0 → w is the unmodified base profile)."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)
    from tests.test_train_step import _scene

    scene = SceneArrays.from_scene(_scene())
    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                       hidden_dim=32, skip_pos=1)
    occ = OccupancyConfig(resolution=8, lo=(-1.5, -1.5, -1.5),
                          hi=(1.5, 1.5, 1.5), n_probes=16,
                          explore_frac=0.02)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    pos_b, dir_b = vanilla_encoders()
    tx = make_optimizer(5e-4, "cosine", {"T_max": 100, "eta_min": 5e-6})

    def run(anneal, start_step):
        hyper = TrainHyper(model=model, nc=16, nf=16, samp_near=2.0,
                           samp_far=6.0, sampling_mode="occupancy",
                           occ_cfg=occ, occ_explore_anneal=anneal)
        state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                                 near=2.0, far=6.0)
        state = state._replace(step=jnp.int32(start_step))
        fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                              jnp.asarray(dir_b), base_seed=42)
        # grid with structure so blending actually moves samples
        grid = jnp.where(jnp.arange(8 ** 3) % 8 < 2, 5.0, 0.0)
        _, m = fn(state, scene, grid)
        return float(m["loss"])

    # early step: annealed (blend≈1) differs from non-annealed
    assert run(0, 0) != run(100, 0)
    # past the horizon: blend clamps to 0 → w is bit-exactly the base
    # profile → identical losses
    assert run(0, 500) == run(100, 500)


def test_updater_ema_and_density_pickup():
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params

    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=32, skip_pos=1)
    params = init_nerf_params(jax.random.PRNGKey(0), model,
                              initial_acc_opacity=0.9,
                              sigma_activation="relu")
    pos_b, dir_b = vanilla_encoders()
    upd = make_occupancy_updater(model, jnp.asarray(pos_b), jnp.asarray(dir_b),
                                 CFG, sigma_activation="relu")
    grid = jnp.zeros((CFG.resolution ** 3,))
    g1 = upd(grid, params, jax.random.PRNGKey(1))
    assert float(g1.max()) > 0.0            # picked up model density
    # decay: with a zero-density model the grid decays geometrically
    params0 = init_nerf_params(jax.random.PRNGKey(0), model)
    # force large negative sigma bias → relu(sigma)=0 everywhere
    params0["sigma_out"]["b"] = jnp.full((1,), -100.0)
    params0["sigma_out"]["w"] = params0["sigma_out"]["w"] * 0.0
    g2 = upd(g1, params0, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1) * CFG.decay,
                               rtol=1e-5)


def test_occupancy_train_step_learns():
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)
    from tests.test_train_step import _scene

    arrs = SceneArrays.from_scene(_scene())
    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=64, skip_pos=1)
    occ = OccupancyConfig(resolution=16, lo=(-3.0, -3.0, -3.0),
                          hi=(3.0, 3.0, 3.0), n_probes=16, update_every=8)
    hyper = TrainHyper(model=model, nc=8, nf=16, samp_near=2.0, samp_far=6.0,
                       sampling_mode="occupancy", occ_cfg=occ)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    tx = make_optimizer(5e-3, "none", {})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0, far=6.0)
    assert state.params_c == {}        # no coarse model in occupancy mode
    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b))
    upd = make_occupancy_updater(model, jnp.asarray(pos_b), jnp.asarray(dir_b),
                                 occ, sigma_activation="relu")
    grid = init_occupancy_grid(occ)
    losses = []
    for i in range(30):
        state, m = step_fn(state, arrs, grid)
        losses.append(float(m["loss"]))
        if (i + 1) % occ.update_every == 0:
            grid = upd(grid, state.params_f, jax.random.PRNGKey(i))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert np.isfinite(losses).all()


def test_cli_occupancy_ndc_llff(tmp_path):
    """Occupancy sampling in NDC marching space: the grid box must be the
    NDC frustum [-1,1]x[-1,1]x[0,1], not the world AABB."""
    import json
    from tests.test_loaders import _make_llff
    from nerf_sandbox_tpu.scripts.train_nerf import main
    root = _make_llff(tmp_path / "fern", n=5, H=12, W=16)
    out = tmp_path / "exp"
    main(["--data_root", str(root), "--out_dir", str(out),
          "--data_kind", "llff", "--use_ndc", "--sampling", "occupancy",
          "--occ_res", "16", "--occ_update_every", "4", "--occ_probes", "8",
          "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
          "--max_steps", "4", "--rays_per_batch", "32", "--nc", "4",
          "--nf", "8", "--num_val_steps", "1", "--ckpt_every", "4",
          "--log_every", "2", "--progress_frames", "2", "--eval_chunk", "128"])
    dbg = json.loads((out / "run_debug.json").read_text())
    assert dbg["scene"]["use_ndc"] is True
    assert dbg["forward_probe"]["rgb_finite"]
    assert (out / "checkpoints" / "ckpt_0000004.ckpt").exists()


def test_cli_occupancy_smoke(tmp_path):
    import json
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    main(["--data_root", str(scene), "--out_dir", str(out),
          "--data_kind", "blender", "--sampling", "occupancy",
          "--occ_res", "16", "--occ_update_every", "4", "--occ_probes", "8",
          "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
          "--max_steps", "8", "--rays_per_batch", "32", "--nc", "4",
          "--nf", "8", "--num_val_steps", "1", "--ckpt_every", "8",
          "--log_every", "4", "--progress_frames", "2", "--eval_chunk", "128"])
    assert (out / "checkpoints" / "ckpt_0000008.ckpt").exists()
    dbg = json.loads((out / "run_debug.json").read_text())
    assert dbg["forward_probe"]["rgb_finite"]
    # validation rendered through the occupancy path
    assert list((out / "validation" / "val_idx0000" / "rgb").glob("step_*.png"))

    # resume: the non-checkpointed grid is rebuilt from the restored model
    # (zero-grid update) and training continues past the old horizon
    main(["--data_root", str(scene), "--out_dir", str(out),
          "--data_kind", "blender", "--sampling", "occupancy",
          "--occ_res", "16", "--occ_update_every", "4", "--occ_probes", "8",
          "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
          "--max_steps", "10", "--rays_per_batch", "32", "--nc", "4",
          "--nf", "8", "--num_val_steps", "1", "--ckpt_every", "10",
          "--log_every", "4", "--progress_frames", "2", "--eval_chunk", "128",
          "--resume", "latest"])
    assert (out / "checkpoints" / "ckpt_0000010.ckpt").exists()


def test_rebuild_equals_density_field():
    """update(zeros) == current density field (the rebuild-on-resume rule)."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params

    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=32, skip_pos=1)
    params = init_nerf_params(jax.random.PRNGKey(0), model,
                              initial_acc_opacity=0.8, sigma_activation="relu")
    pos_b, dir_b = vanilla_encoders()
    upd = make_occupancy_updater(model, jnp.asarray(pos_b), jnp.asarray(dir_b),
                                 CFG, sigma_activation="relu")
    key = jax.random.PRNGKey(5)
    rebuilt = upd(jnp.zeros((CFG.resolution ** 3,)), params, key)
    ones_once = upd(jnp.ones((CFG.resolution ** 3,)), params, key)
    # ones-init carries a stale 0.95 floor; zero-init equals pure density
    assert float(rebuilt.min()) < float(ones_once.min())
    assert float(rebuilt.max()) > 0.0

def test_occupancy_resume_equivalence(tmp_path):
    """VERDICT r2 #5: a resumed occupancy run reproduces the uninterrupted
    run bit-for-bit. The EMA grid is checkpointed (it is NOT a pure function
    of the current params), all RNG is fold_in(seed, step), and Adam state
    round-trips — so run B (resume at 6, train to 12) must produce the same
    step-12 params and grid as run A (12 straight).
    Reference resume contract: trainer.py:670-696."""
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)

    common = ["--data_root", str(scene), "--data_kind", "blender",
              "--sampling", "occupancy", "--occ_res", "16",
              "--occ_update_every", "4", "--occ_probes", "8",
              "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
              "--max_steps", "12", "--rays_per_batch", "32", "--nc", "4",
              "--nf", "8", "--num_val_steps", "1", "--ckpt_every", "6",
              "--log_every", "6", "--progress_frames", "0",
              "--eval_chunk", "128", "--seed", "3"]
    a, b = tmp_path / "a", tmp_path / "b"
    main(["--out_dir", str(a)] + common)
    main(["--out_dir", str(b),
          "--resume", str(a / "checkpoints" / "ckpt_0000006.ckpt")] + common)

    fa = np.load(a / "checkpoints" / "ckpt_0000012.ckpt")
    fb = np.load(b / "checkpoints" / "ckpt_0000012.ckpt")
    keys = [k for k in fa.files if k != "__meta__"]
    assert "extra||occ_grid" in keys
    assert set(keys) == set(k for k in fb.files if k != "__meta__")
    for k in keys:
        np.testing.assert_allclose(fa[k], fb[k], rtol=0, atol=0,
                                   err_msg=f"resume divergence in {k}")


def test_gridless_checkpoint_falls_back_to_rebuild(tmp_path, capsys):
    """Checkpoints from before the grid was saved (or after an --occ_res
    change) resume via the zero-grid rebuild, not an error."""
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    from nerf_sandbox_tpu.train import checkpoints as ckpt
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    common = ["--data_root", str(scene), "--data_kind", "blender",
              "--sampling", "occupancy", "--occ_res", "16",
              "--occ_update_every", "4", "--occ_probes", "8",
              "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
              "--rays_per_batch", "32", "--nc", "4", "--nf", "8",
              "--num_val_steps", "1", "--log_every", "8",
              "--progress_frames", "0", "--eval_chunk", "128"]
    out = tmp_path / "exp"
    main(["--out_dir", str(out), "--max_steps", "8", "--ckpt_every", "8"]
         + common)
    # strip the grid from the checkpoint (simulate the old format)
    p = out / "checkpoints" / "ckpt_0000008.ckpt"
    with np.load(p, allow_pickle=False) as zf:
        payload = {k: zf[k] for k in zf.files if not k.startswith("extra||")}
    import io
    buf = io.BytesIO()
    np.savez(buf, **payload)
    p.write_bytes(buf.getvalue())
    assert ckpt.load_extras(p) == {}
    capsys.readouterr()
    main(["--out_dir", str(out), "--max_steps", "10", "--ckpt_every", "10",
          "--resume", "latest"] + common)
    assert (out / "checkpoints" / "ckpt_0000010.ckpt").exists()
    assert "occupancy grid restored" not in capsys.readouterr().out


def test_ndc_explore_floor_default(tmp_path):
    """Under NDC the trainer defaults occ_explore_frac 0.02 -> 0.5 (far-
    plane bootstrap, RESULTS.md); an explicit flag value is respected."""
    from tests.test_loaders import _make_llff
    from nerf_sandbox_tpu.config import (apply_path_defaults,
                                         build_argparser, make_cfg_from_args)
    from nerf_sandbox_tpu.train.trainer import Trainer
    root = _make_llff(tmp_path / "fern", n=5, H=12, W=16)
    base = ["--data_root", str(root), "--out_dir", str(tmp_path / "e"),
            "--data_kind", "llff", "--use_ndc", "--sampling", "occupancy",
            "--occ_res", "8", "--occ_probes", "8", "--n_layers", "2",
            "--hidden_dim", "32", "--skip_pos", "1", "--nc", "4", "--nf", "8",
            "--rays_per_batch", "32", "--eval_chunk", "128"]
    def mk(argv):
        return apply_path_defaults(
            make_cfg_from_args(build_argparser().parse_args(argv)), "llff")

    tr = Trainer(mk(base))
    assert tr.occ_cfg.explore_frac == 0.5
    tr2 = Trainer(mk(base + ["--occ_explore_frac", "0.1"]))
    assert tr2.occ_cfg.explore_frac == 0.1
    # an explicit 0.02 (the world-space auto value) is respected too
    tr3 = Trainer(mk(base + ["--occ_explore_frac", "0.02"]))
    assert tr3.occ_cfg.explore_frac == 0.02


def test_occupancy_eval_culling_contract():
    """--eval_fine_frac in occupancy mode: rays crossing occupied cells
    match the full eval exactly; rays the grid certifies empty composite
    directly to background."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    from nerf_sandbox_tpu.render.renderer import EvalHyper, make_tile_renderer

    R = CFG.resolution
    grid = jnp.zeros((R ** 3,))
    idx = jnp.arange(R ** 3)
    grid = jnp.where(idx % R == 3, 100.0, grid)   # slab z in [-0.25, 0)

    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=32, skip_pos=1)
    pos_b, dir_b = vanilla_encoders()
    pf = init_nerf_params(jax.random.PRNGKey(1), model)

    T = 32
    # first half: +z rays through the box (cross the occupied slab);
    # second half: same rays displaced to x=5 (entirely outside the box)
    xy = jax.random.uniform(jax.random.PRNGKey(2), (T // 2, 2),
                            minval=-0.5, maxval=0.5)
    o_in = jnp.concatenate([xy, jnp.full((T // 2, 1), -2.0)], axis=-1)
    o_out = o_in.at[:, 0].add(5.0)
    o = jnp.concatenate([o_in, o_out])
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (T, 3))
    rn = jnp.ones((T, 1))
    key = jax.random.PRNGKey(3)

    def run(frac):
        hyp = EvalHyper(model=model, nf_eval=8, samp_near=1.0, samp_far=3.0,
                        white_bkgd=True, compute_dtype="float32",
                        sampling_mode="occupancy", occ_cfg=CFG,
                        eval_fine_frac=frac)
        tile = make_tile_renderer(hyp, jnp.asarray(pos_b), jnp.asarray(dir_b))
        return tile(grid, pf, o, d, rn, d, key)

    full = run(1.0)
    culled = run(0.5)

    content, empty = np.arange(T // 2), np.arange(T // 2, T)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(culled[i])[content],
                                   np.asarray(full[i])[content], atol=1e-6)
    np.testing.assert_allclose(np.asarray(culled[0])[empty], 1.0)  # white bg
    np.testing.assert_allclose(np.asarray(culled[1])[empty], 0.0)  # acc
    np.testing.assert_allclose(np.asarray(culled[2])[empty], 0.0)  # depth


def test_contracted_grid_covers_unbounded_points():
    """cfg.contracted: the ±2 contracted box holds EVERY finite world
    point — far content (r=50) lands in the outer shell cells instead of
    returning 0, and cells are distinct from near content's."""
    cfg = OccupancyConfig(resolution=16, lo=(-2.0, -2.0, -2.0),
                          hi=(2.0, 2.0, 2.0), contracted=True)
    R = cfg.resolution
    grid = jnp.arange(R ** 3, dtype=jnp.float32) + 1.0   # all nonzero
    near = jnp.array([[0.3, 0.0, 0.0]])
    far = jnp.array([[50.0, 0.0, 0.0], [0.0, 0.0, -80.0]])
    v_near = np.asarray(grid_values(grid, cfg, near))
    v_far = np.asarray(grid_values(grid, cfg, far))
    assert np.all(v_near > 0) and np.all(v_far > 0)      # nothing out-of-box
    assert v_near[0] != v_far[0]                         # distinct cells
    # uncontracted cfg at the same box: r=50 is out of the ±2 box → 0
    cfg_w = cfg._replace(contracted=False)
    np.testing.assert_array_equal(np.asarray(grid_values(grid, cfg_w, far)),
                                  [0.0, 0.0])


def test_contracted_updater_marks_far_density():
    """Contracted-grid EMA update: a model whose density peaks at world
    radius ~10 marks the contracted shell cells there (|c| = 2-1/10 = 1.9),
    not the unit-ball interior."""
    from nerf_sandbox_tpu.core.encoding import (scene_contract,
                                                vanilla_encoders)
    cfg = OccupancyConfig(resolution=16, lo=(-2.0, -2.0, -2.0),
                          hi=(2.0, 2.0, 2.0), contracted=True)
    R = cfg.resolution

    # verify cell-center inversion geometry without a model: the updater's
    # world points must contract back into their source cells
    from nerf_sandbox_tpu.core.encoding import scene_uncontract
    idx = jnp.arange(R ** 3)
    cell = jnp.stack([(idx // (R * R)) % R, (idx // R) % R, idx % R],
                     axis=-1).astype(jnp.float32)
    u = (cell + 0.5) / R
    lo = jnp.asarray(cfg.lo); hi = jnp.asarray(cfg.hi)
    cpts = lo + u * (hi - lo)
    world = scene_uncontract(cpts)
    back = scene_contract(world)
    # interior-ball and shell cells invert exactly; corner cells (|c|>=2)
    # clamp to the shell boundary — exclude them
    n = np.linalg.norm(np.asarray(cpts), axis=-1)
    ok = n < 1.95
    np.testing.assert_allclose(np.asarray(back)[ok], np.asarray(cpts)[ok],
                               rtol=1e-3, atol=1e-4)

    # and the real updater runs end-to-end with a tiny MLP, all-finite
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                       hidden_dim=16, skip_pos=1)
    params = init_nerf_params(jax.random.PRNGKey(0), model, near=0.5,
                              far=90.0)
    pos_b, dir_b = vanilla_encoders()
    upd = make_occupancy_updater(model, jnp.asarray(pos_b),
                                 jnp.asarray(dir_b), cfg,
                                 scene_contraction=True,
                                 compute_dtype=jnp.float32)
    g = upd(jnp.zeros((R ** 3,)), params, jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(g)))


def test_probe_weights_lindisp_spacing():
    """cfg.lindisp: probe bins are disparity-spaced (mirroring the
    sampler), concentrating probes near the camera; mids stay monotone in
    [near, far]. Non-lindisp stays the uniform partition."""
    cfg = CFG._replace(lindisp=True, explore_frac=0.0)
    grid = init_occupancy_grid(cfg)
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, 1.0]])
    near, far = 0.125, 22.5
    z, _ = ray_probe_weights(grid, cfg, o, d, jnp.ones((1, 1)), near, far)
    z = np.asarray(z[0])
    assert np.all(np.diff(z) > 0) and z[0] > near and z[-1] < far
    # disparity spacing: half the probes sit below the harmonic midpoint
    mid_disp = 2.0 / (1.0 / near + 1.0 / far)
    assert np.sum(z < mid_disp) == cfg.n_probes // 2
    # foreground coverage: the normalized-360 foreground band [0.4, 1.6]
    # gets a real share of probes (the linear partition gave it ~0)
    assert np.sum((z > 0.4) & (z < 1.6)) >= cfg.n_probes // 8
    # linear path: uniform widths, unchanged semantics
    zl, _ = ray_probe_weights(grid, CFG, o, d, jnp.ones((1, 1)), near, far)
    np.testing.assert_allclose(np.diff(np.asarray(zl[0])),
                               (far - near) / CFG.n_probes, rtol=1e-4)


def test_bad_basin_divergence_warning(tmp_path, capsys):
    """Proposal/hierarchical placement feeding a fast grid gets a loud
    named warning when val PSNR stalls in the collapse regime (RESULTS.md
    'Distortion-loss collapse' §5, VERDICT r4 #5); the seed-robust
    occupancy default never warns."""
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.config import (apply_path_defaults,
                                         build_argparser, make_cfg_from_args)
    from nerf_sandbox_tpu.train.trainer import Trainer
    root = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    base = ["--data_root", str(root), "--out_dir", str(tmp_path / "e"),
            "--data_kind", "blender", "--encoder", "kplanes",
            "--lr_grid", "1e-2", "--n_layers", "2", "--hidden_dim", "32",
            "--skip_pos", "1", "--nc", "4", "--nf", "8",
            "--rays_per_batch", "32", "--eval_chunk", "128"]

    def mk(argv):
        return apply_path_defaults(
            make_cfg_from_args(build_argparser().parse_args(argv)),
            "blender")

    tr = Trainer(mk(base + ["--sampling", "proposal"]))
    tr._check_val_divergence(1000, 16.5)     # first event: no baseline yet
    tr._check_val_divergence(2000, 16.6)     # stalled in the collapse band
    out = capsys.readouterr().out
    assert "[WARN] val PSNR stalled" in out
    assert "--sampling occupancy" in out
    assert tr._divergence_warned
    tr._check_val_divergence(3000, 16.7)     # warns ONCE, not every event
    assert out.count("[WARN] val PSNR stalled") == 1

    # healthy trajectory: no warning even in the fragile config
    tr2 = Trainer(mk(base + ["--sampling", "proposal"]))
    tr2._check_val_divergence(1000, 20.9)
    tr2._check_val_divergence(2000, 22.4)
    assert not tr2._divergence_warned

    # occupancy placement is measured seed-robust: detector stays silent
    tr3 = Trainer(mk(base + ["--sampling", "occupancy",
                             "--occ_res", "8", "--occ_probes", "8"]))
    tr3._check_val_divergence(1000, 16.5)
    tr3._check_val_divergence(2000, 16.6)
    assert not tr3._divergence_warned
