"""Mesh-sharding tests on the 8-device virtual CPU mesh: 2-D data x model
(tensor-parallel) training, sharded eval rendering, and the driver dry run."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.parallel.mesh import (
    apply_param_shardings, make_mesh, make_mesh_2d, nerf_param_shardings)


def test_2d_mesh_tp_train_step_matches_single_device():
    from tests.test_train_step import _setup
    # single device reference
    s1, f1, arrs = _setup(batch=128)
    s1, m1 = f1(s1, arrs)

    plan = make_mesh_2d(4, 2)
    assert plan.n_devices == 8
    s2, f2, _ = _setup(batch=128, mesh=plan)
    s2 = s2._replace(params_c=apply_param_shardings(plan, s2.params_c),
                     params_f=apply_param_shardings(plan, s2.params_f))
    s2, m2 = f2(s2, arrs)
    # same seed → identical math regardless of sharding layout
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)


def test_param_sharding_specs_alternate():
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    plan = make_mesh_2d(4, 2)
    params = init_nerf_params(jax.random.PRNGKey(0),
                              NeRFConfig(63, 27, n_layers=4, hidden_dim=64,
                                         skip_pos=2))
    sh = nerf_param_shardings(plan, params)
    s0 = sh["trunk"][0]["w"].spec
    s1 = sh["trunk"][1]["w"].spec
    assert s0 == jax.sharding.PartitionSpec(None, "model")
    assert s1 == jax.sharding.PartitionSpec("model", None)


def test_trunk_tp_specs_pairing():
    """The Megatron pairing must restart at the skip-concat layer, demote a
    dangling column layer before any replicated-input consumer (the concat,
    the heads), and only emit 'row' directly after a matching 'col' — the
    invariants that keep GSPMD's collectives to exactly one psum per row
    layer (parallel/mesh.py:trunk_tp_specs docstring)."""
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, trunk_in_dims
    from nerf_sandbox_tpu.parallel.mesh import trunk_tp_specs

    def specs_for(n_layers, hidden, skip_pos, n_model=2, enc=63):
        cfg = NeRFConfig(enc, 27, n_layers=n_layers, hidden_dim=hidden,
                         skip_pos=skip_pos)
        ins = trunk_in_dims(cfg)
        return trunk_tp_specs(ins, [hidden] * n_layers, n_model)

    # vanilla: 8 layers, skip@4 (even) → four clean pairs
    assert specs_for(8, 256, 4) == ["col", "row"] * 4
    # odd skip: the col dangling before the concat is demoted
    assert specs_for(5, 64, 3) == ["col", "row", "rep", "col", "row"]
    # skip@1: layer 0 would dangle into the concat → demoted
    assert specs_for(3, 64, 1) == ["rep", "col", "row"]
    # trailing col (odd tail) is demoted so the trunk ends replicated
    assert specs_for(7, 256, 4) == ["col", "row"] * 3 + ["rep"]
    # non-divisible hidden → everything replicated
    assert specs_for(4, 63, 2, n_model=2) == ["rep"] * 4


def test_grid_tp_kplanes_encode_sharded_tables():
    """Grid tensor-parallelism (k-planes tables sharded on the feature axis
    over ``model``): numerics match replicated, each device holds 1/m of
    every table, and the compiled program never all-gathers a table — the
    F-sharding must survive both plane contractions (the einsum forms in
    kplanes.py:_encode_chunk), leaving only the small (Q, out_dim)
    boundary gather."""
    import jax.numpy as jnp
    from nerf_sandbox_tpu.models.kplanes import (KPlanesConfig,
                                                 init_kplanes_params,
                                                 kplanes_encode)
    from nerf_sandbox_tpu.parallel.mesh import grid_param_shardings

    plan = make_mesh_2d(4, 2)
    kcfg = KPlanesConfig(plane_res=(8, 16), plane_features=4, line_res=32,
                         line_features=4, chunk=4096, shard_features=True)
    params = init_kplanes_params(jax.random.PRNGKey(0), kcfg)
    sh = grid_param_shardings(plan, params)
    sharded = jax.tree_util.tree_map(jax.device_put, params, sh)
    # per-device: half the feature channels of every table
    assert {s.data.shape for s in sharded["plane0_xy"].addressable_shards} \
        == {(8, 8, 2)}
    assert {s.data.shape for s in sharded["line_x"].addressable_shards} \
        == {(32, 2)}

    pts = jax.random.uniform(jax.random.PRNGKey(1), (512, 3),
                             minval=-1.5, maxval=1.5)
    f = jax.jit(lambda p, x: kplanes_encode(p, x, kcfg,
                                            compute_dtype=jnp.float32))
    out_rep = f(params, pts)
    out_tp = f(sharded, pts)
    np.testing.assert_allclose(np.asarray(out_rep), np.asarray(out_tp),
                               atol=1e-5)
    # the single-chip reshape-matmul form (shard_features=False, the
    # measured-faster default) is numerically identical — same dot_general
    # contraction, different layout
    out_reshape = jax.jit(
        lambda p, x: kplanes_encode(
            p, x, kcfg._replace(shard_features=False),
            compute_dtype=jnp.float32))(params, pts)
    np.testing.assert_allclose(np.asarray(out_rep), np.asarray(out_reshape),
                               atol=1e-6)

    txt = f.lower(sharded, pts).compile().as_text()
    gathers = [l for l in txt.splitlines() if "all-gather" in l]
    for shape in ("f32[8,8,4]", "f32[16,16,4]", "f32[32,4]"):
        assert not any(shape in l for l in gathers), \
            f"full table {shape} all-gathered: {gathers}"


def test_grid_tp_kplanes_train_step_matches_single_device():
    """Full kplanes train step with BOTH TP families applied (trunk col/row
    + grid feature-sharding) on the 4x2 data x model mesh == single-device
    numerics, and grads/updates keep the tables sharded (the step's output
    params reuse the input shardings)."""
    from tests.test_train_step import _scene
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.kplanes import KPlanesConfig
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (TrainHyper, build_train_step,
                                             init_train_state, make_optimizer)
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders

    arrs = SceneArrays.from_scene(_scene())
    kcfg = KPlanesConfig(plane_res=(8,), plane_features=4, line_res=16,
                         line_features=4, chunk=4096, shard_features=True)
    model = NeRFConfig(kcfg.out_dim, 27, n_layers=2, hidden_dim=64,
                       skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=16, samp_near=2.0, samp_far=6.0,
                       pos_encoder="kplanes", enc_cfg=kcfg)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    pos_b, dir_b = vanilla_encoders()
    tx = make_optimizer(5e-3, "none", {}, grid_lr=5e-2)

    # single-device reference runs the DEFAULT (reshape-matmul) contraction
    # form — cross-form agreement is part of what this test pins
    hyper_ref = hyper._replace(
        enc_cfg=kcfg._replace(shard_features=False))
    s1 = init_train_state(jax.random.PRNGKey(0), hyper_ref, tx, near=2.0,
                          far=6.0)
    f1 = build_train_step(hyper_ref, spec, tx, jnp.asarray(pos_b),
                          jnp.asarray(dir_b))
    s1, m1 = f1(s1, arrs)

    plan = make_mesh_2d(4, 2)
    s2 = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0,
                          far=6.0)
    s2 = s2._replace(params_c=apply_param_shardings(plan, s2.params_c),
                     params_f=apply_param_shardings(plan, s2.params_f))
    f2 = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                          jnp.asarray(dir_b), plan=plan)
    s2, m2 = f2(s2, arrs)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    # the stepped table is still feature-sharded (TP survives the update)
    tbl = s2.params_f["pos_grid"]["plane0_xy"]
    assert {s.data.shape for s in tbl.addressable_shards} == {(8, 8, 2)}


def test_grid_tp_hashgrid_train_step_matches_single_device():
    """Hash tables (L, 2^T, F) also feature-shard over ``model`` when F
    divides it: the per-corner row gathers and the backward scatter-adds
    stay device-local on the F slice (memory /= model for the family whose
    tables ARE the memory). TP step == single-device numerics and the
    tables stay sharded through the update."""
    from tests.test_train_step import _scene
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.hashgrid import HashGridConfig
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (TrainHyper, build_train_step,
                                             init_train_state, make_optimizer)
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders

    arrs = SceneArrays.from_scene(_scene())
    hcfg = HashGridConfig(n_levels=4, n_features=2, log2_table_size=10,
                          base_res=4, max_res=32, aabb_scale=4.0)
    model = NeRFConfig(enc_pos_dim=hcfg.out_dim, enc_dir_dim=27, n_layers=2,
                       hidden_dim=64, skip_pos=1)
    hyper = TrainHyper(model=model, nc=8, nf=8, samp_near=2.0, samp_far=6.0,
                       pos_encoder="hashgrid", enc_cfg=hcfg)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    pos_b, dir_b = vanilla_encoders()
    tx = make_optimizer(5e-3, "none", {})

    s1 = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0,
                          far=6.0)
    f1 = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                          jnp.asarray(dir_b))
    s1, m1 = f1(s1, arrs)

    plan = make_mesh_2d(4, 2)
    s2 = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0,
                          far=6.0)
    s2 = s2._replace(params_c=apply_param_shardings(plan, s2.params_c),
                     params_f=apply_param_shardings(plan, s2.params_f))
    tbl = s2.params_f["pos_grid"]
    assert {s.data.shape for s in tbl.addressable_shards} == {(4, 1024, 1)}
    f2 = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                          jnp.asarray(dir_b), plan=plan)
    s2, m2 = f2(s2, arrs)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    tbl = s2.params_f["pos_grid"]
    assert {s.data.shape for s in tbl.addressable_shards} == {(4, 1024, 1)}


def test_tp_wide_model_memory_capacity():
    """The capability TP actually buys on this workload: per-device PARAM
    MEMORY. A wide trunk (hidden 1024 — 8x the vanilla param count; wide
    NeRF variants and big grid tables are the real TP audience) sharded
    4-way over ``model`` must hold only 1/4 of each sharded layer per
    device, and the TP train step must still match replicated numerics.
    Perf on this 2.4M-param vanilla model is NOT claimed (COVERAGE #27:
    plumbing/memory-capacity scaffolding, unmeasurable without >1 real
    chip)."""
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    plan = make_mesh_2d(2, 4)
    cfg = NeRFConfig(63, 27, n_layers=4, hidden_dim=1024, skip_pos=2)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    sharded = apply_param_shardings(plan, params)

    w0 = sharded["trunk"][0]["w"]              # column-parallel (1024 out)
    assert w0.shape == (63, 1024)
    shard_shapes = {s.data.shape for s in w0.addressable_shards}
    assert shard_shapes == {(63, 256)}         # 1/4 of the out dim per device
    w1 = sharded["trunk"][1]["w"]              # row-parallel (1024 in)
    assert {s.data.shape for s in w1.addressable_shards} == {(256, 1024)}

    # layer-4 (skip concat input 1024+63=1087, not divisible) stays whole
    w2 = sharded["trunk"][2]["w"]
    assert w2.shape == (1024 + 63, 1024)

    # numerics: TP forward == replicated forward on the same inputs
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import nerf_apply
    pos_b, dir_b = vanilla_encoders()
    from nerf_sandbox_tpu.core.encoding import positional_encoding
    pts = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    ep = positional_encoding(pts, jnp.asarray(pos_b))
    ed = positional_encoding(dirs, jnp.asarray(dir_b))
    out_rep = nerf_apply(params, cfg, ep, ed)
    out_tp = jax.jit(lambda p: nerf_apply(p, cfg, ep, ed))(sharded)
    np.testing.assert_allclose(np.asarray(out_rep), np.asarray(out_tp),
                               atol=2e-5)


def test_sharded_eval_render():
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    from nerf_sandbox_tpu.render.renderer import (
        EvalHyper, make_tile_renderer, render_rays_chunked)

    plan = make_mesh()
    model = NeRFConfig(63, 27, n_layers=2, hidden_dim=64, skip_pos=1)
    pos_b, dir_b = vanilla_encoders()
    hyper = EvalHyper(model=model, nc_eval=8, nf_eval=8, samp_near=2.0,
                      samp_far=6.0)
    tile = make_tile_renderer(hyper, jnp.asarray(pos_b), jnp.asarray(dir_b),
                              plan=plan)
    tile_1dev = make_tile_renderer(hyper, jnp.asarray(pos_b),
                                   jnp.asarray(dir_b))
    pc = init_nerf_params(jax.random.PRNGKey(0), model)
    pf = init_nerf_params(jax.random.PRNGKey(1), model)
    n = 256
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    args = (jnp.zeros((n, 3)), d, jnp.ones((n, 1)), d)
    out_mesh = render_rays_chunked(tile, pc, pf, *args, eval_chunk=128)
    out_one = render_rays_chunked(tile_1dev, pc, pf, *args, eval_chunk=128)
    np.testing.assert_allclose(np.asarray(out_mesh["rgb"]),
                               np.asarray(out_one["rgb"]), atol=1e-5)


def test_sharded_fused_eval_matches_xla_and_single_device():
    """VERDICT r2 #2: the fused Pallas eval runs under shard_map on a mesh
    (interpret mode on the CPU mesh) — sharded-fused == single-device-fused
    (exactly: rays are i.i.d.) == sharded-XLA (bf16 tolerance), including
    the fine-ray culling and early-ray-termination variants."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    from nerf_sandbox_tpu.render.renderer import (
        EvalHyper, make_tile_renderer, render_rays_chunked)

    plan = make_mesh()
    assert plan.n_devices == 8
    model = NeRFConfig(63, 27, n_layers=3, hidden_dim=128, skip_pos=1)
    pos_b, dir_b = vanilla_encoders()
    pb, db = jnp.asarray(pos_b), jnp.asarray(dir_b)
    pc = init_nerf_params(jax.random.PRNGKey(0), model)
    pf = init_nerf_params(jax.random.PRNGKey(1), model)
    n = 256
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    args = (jnp.zeros((n, 3)), d, jnp.ones((n, 1)), d)

    for extra in ({}, {"eval_fine_frac": 0.5}, {"eval_ert_eps": 1e-4}):
        base = dict(model=model, nc_eval=8, nf_eval=8, samp_near=2.0,
                    samp_far=6.0, **extra)
        fused = EvalHyper(**base, use_pallas=True, pallas_interpret=True)
        xla = EvalHyper(**base)
        t_fused_mesh = make_tile_renderer(fused, pb, db, plan=plan)
        t_fused_one = make_tile_renderer(fused, pb, db)
        t_xla_mesh = make_tile_renderer(xla, pb, db, plan=plan)
        o_fm = render_rays_chunked(t_fused_mesh, pc, pf, *args, eval_chunk=128)
        o_f1 = render_rays_chunked(t_fused_one, pc, pf, *args, eval_chunk=128)
        o_xm = render_rays_chunked(t_xla_mesh, pc, pf, *args, eval_chunk=128)
        # sharding must not change fused numerics (per-ray independent math)
        np.testing.assert_allclose(np.asarray(o_fm["rgb"]),
                                   np.asarray(o_f1["rgb"]), atol=2e-5,
                                   err_msg=f"fused mesh vs 1-dev {extra}")
        # fused vs XLA: bf16 accumulation-order tolerance; the culling
        # variant picks (possibly different) top-K rays per path, so it is
        # only compared fused-vs-fused above
        if "eval_fine_frac" not in extra:
            np.testing.assert_allclose(np.asarray(o_fm["rgb"]),
                                       np.asarray(o_xm["rgb"]), atol=3e-2,
                                       err_msg=f"fused vs xla {extra}")


def test_sharded_fused_eval_uneven_tile():
    """Tile sizes that do NOT divide the 8-device mesh (e.g. the last tile
    of a frame, or --eval_chunk 100) must render on the shard_map-fused
    path — padded by repeating the last ray and sliced back — with
    numerics equal to the single-device fused path."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    from nerf_sandbox_tpu.render.renderer import (
        EvalHyper, make_tile_renderer, render_rays_chunked)

    plan = make_mesh()
    model = NeRFConfig(63, 27, n_layers=3, hidden_dim=128, skip_pos=1)
    pos_b, dir_b = vanilla_encoders()
    pb, db = jnp.asarray(pos_b), jnp.asarray(dir_b)
    pc = init_nerf_params(jax.random.PRNGKey(0), model)
    pf = init_nerf_params(jax.random.PRNGKey(1), model)
    n = 157                      # prime-ish: 157 % 8 != 0; chunks of 60 too
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    args = (jnp.zeros((n, 3)), d, jnp.ones((n, 1)), d)

    hyper = EvalHyper(model=model, nc_eval=8, nf_eval=8, samp_near=2.0,
                      samp_far=6.0, use_pallas=True, pallas_interpret=True)
    t_mesh = make_tile_renderer(hyper, pb, db, plan=plan)
    t_one = make_tile_renderer(hyper, pb, db)
    o_m = render_rays_chunked(t_mesh, pc, pf, *args, eval_chunk=60)
    o_1 = render_rays_chunked(t_one, pc, pf, *args, eval_chunk=60)
    np.testing.assert_allclose(np.asarray(o_m["rgb"]), np.asarray(o_1["rgb"]),
                               atol=2e-5)


def test_sharded_scene_gather_matches_replicated():
    """Frame-sharded image bank (--shard_scene): the shard_map masked
    gather + psum pixel fetch returns bit-identical batches to the
    replicated gather — including with a frame count (5) that does not
    divide the 8-device mesh (zero-padding never selected)."""
    from tests.test_train_step import _scene
    from nerf_sandbox_tpu.data.sampler import (
        RayBatchSpec, SceneArrays, sample_ray_batch)

    plan = make_mesh()
    assert plan.n_devices == 8
    scene = _scene(n=5)
    rep = SceneArrays.from_scene(scene)
    shd = SceneArrays.from_scene_sharded(scene, plan)
    assert shd.n_frames == 5                       # real count from Ks
    assert shd.images.shape[0] == 8                # padded to the mesh
    # every device holds exactly one frame block
    assert {s.data.shape[0] for s in shd.images.addressable_shards} == {1}

    for single in (False, True):
        spec = RayBatchSpec(rays_per_batch=256, image_h=16, image_w=16,
                            single_frame=single)
        b_rep = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(3), rep,
                                 spec)
        b_shd = sample_ray_batch(jax.random.PRNGKey(0), jnp.int32(3), shd,
                                 spec._replace(shard_frames=True), plan=plan)
        for k in b_rep:
            np.testing.assert_array_equal(
                np.asarray(b_rep[k]), np.asarray(b_shd[k]),
                err_msg=f"{k} single_frame={single}")


def test_sharded_scene_train_step_matches_replicated():
    """Full train step on the 8-device mesh with the frame-sharded bank ==
    the replicated-bank step (same seed → identical batches → identical
    loss)."""
    from tests.test_train_step import _scene, _setup
    from nerf_sandbox_tpu.data.sampler import SceneArrays

    plan = make_mesh()
    s1, f1, arrs = _setup(batch=128, mesh=plan)
    s1, m1 = f1(s1, arrs)

    import jax.numpy as jnp_
    from tests.test_train_step import (NeRFConfig, RayBatchSpec, TrainHyper,
                                       build_train_step, init_train_state,
                                       make_optimizer, vanilla_encoders)
    scene = _scene()
    shd = SceneArrays.from_scene_sharded(scene, plan)
    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                       hidden_dim=64, skip_pos=1)
    hyper = TrainHyper(model=model, nc=16, nf=16, samp_near=2.0, samp_far=6.0)
    spec = RayBatchSpec(rays_per_batch=128, image_h=16, image_w=16,
                        shard_frames=True)
    tx = make_optimizer(5e-4, "cosine", {"T_max": 100, "eta_min": 5e-6})
    s2 = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0, far=6.0)
    pos_b, dir_b = vanilla_encoders()
    f2 = build_train_step(hyper, spec, tx, jnp_.asarray(pos_b),
                          jnp_.asarray(dir_b), plan=plan)
    s2, m2 = f2(s2, shd)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)


def test_data_mesh_collectives_are_grad_psum_only():
    """Design guard for the production 1-D data layout (params replicated,
    batch sharded): the compiled train step's only model-state collectives
    are the grad-mean all-reduces — no layer weight is ever all-gathered
    (a resharding regression would show up as f32[<hidden>,<hidden>]
    all-gather traffic every step)."""
    from tests.test_train_step import _setup

    plan = make_mesh()
    assert plan.n_devices == 8
    s, f, arrs = _setup(batch=128, mesh=plan)
    txt = f.lower(s, arrs).compile().as_text()
    lines = txt.splitlines()
    # hidden_dim=64 trunk: a replicated-param design must not move any
    # (64,64) weight through all-gather/all-to-all
    for op in ("all-gather", "all-to-all"):
        bad = [l for l in lines if op in l and "f32[64,64]" in l]
        assert not bad, f"weight {op} in data-parallel step: {bad[:2]}"
    # the grad reduction exists (XLA may emit all-reduce or a
    # reduce-scatter+all-gather decomposition; accept either spelling)
    assert any("all-reduce" in l or "reduce-scatter" in l for l in lines)


def test_owned_frame_rows_partition():
    """Every frame is owned by exactly one process (single-process: all),
    and the union covers the real frame range for non-divisible counts."""
    from nerf_sandbox_tpu.parallel.mesh import owned_frame_rows
    plan = make_mesh()
    assert owned_frame_rows(plan, 5) == set(range(5))
    assert owned_frame_rows(plan, 100) == set(range(100))


def test_driver_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_multihost_mesh_train_step_matches_single_device():
    """VERDICT #9: hierarchical 2-D (dcn_data x ici_data) data mesh — the
    full train step runs with the batch sharded over BOTH axes and matches
    single-device numerics."""
    from nerf_sandbox_tpu.parallel.mesh import (batch_sharding,
                                                make_mesh_multihost)
    from tests.test_train_step import _setup

    s1, f1, arrs = _setup(batch=128)
    s1, m1 = f1(s1, arrs)

    plan = make_mesh_multihost(2, 4)
    assert plan.n_devices == 8
    spec = batch_sharding(plan).spec
    assert spec == jax.sharding.PartitionSpec(("dcn_data", "ici_data"))
    s2, f2, _ = _setup(batch=128, mesh=plan)
    s2, m2 = f2(s2, arrs)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)


def test_hierarchical_grad_reduction():
    """Reducing within the slice (ICI axis) first and then across slices
    (DCN axis) equals the flat global reduction — the decomposition XLA
    applies to the grad-mean all-reduce on the multihost mesh."""
    from functools import partial
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from nerf_sandbox_tpu.parallel.mesh import make_mesh_multihost

    plan = make_mesh_multihost(2, 4)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 16))

    @partial(shard_map, mesh=plan.mesh,
             in_specs=P(("dcn_data", "ici_data")), out_specs=P())
    def hier(xs):
        local = jnp.sum(xs, axis=0, keepdims=True)
        ici = jax.lax.psum(local, "ici_data")      # within-slice (ICI)
        return jax.lax.psum(ici, "dcn_data")       # across slices (DCN)

    @partial(shard_map, mesh=plan.mesh,
             in_specs=P(("dcn_data", "ici_data")), out_specs=P())
    def flat(xs):
        return jax.lax.psum(jnp.sum(xs, axis=0, keepdims=True),
                            ("dcn_data", "ici_data"))

    np.testing.assert_allclose(np.asarray(hier(x)), np.asarray(flat(x)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hier(x))[0],
                               np.asarray(jnp.sum(x, axis=0)), rtol=1e-5)


def test_trainer_mesh_slices_cli(tmp_path):
    """--mesh_slices wires the hierarchical mesh through the Trainer and a
    real (tiny) train run completes on it."""
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    main(["--data_root", str(scene), "--out_dir", str(out),
          "--data_kind", "blender", "--max_steps", "4",
          "--rays_per_batch", "64", "--nc", "4", "--nf", "4",
          "--num_val_steps", "1", "--ckpt_every", "4", "--log_every", "2",
          "--progress_frames", "2", "--eval_chunk", "128",
          "--mesh_slices", "2"])
    assert (out / "checkpoints" / "ckpt_0000004.ckpt").exists()


def test_trainer_mesh_model_cli(tmp_path):
    """--mesh_model 2 wires the data x model TP mesh through the Trainer:
    a real (tiny) kplanes train run completes with feature-sharded tables,
    checkpoints, and resumes (restore re-applies the TP shardings)."""
    from tests.test_loaders import _make_blender
    from nerf_sandbox_tpu.scripts.train_nerf import main
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=16)
    out = tmp_path / "exp"
    args = ["--data_root", str(scene), "--out_dir", str(out),
            "--data_kind", "blender", "--rays_per_batch", "64",
            "--nc", "4", "--nf", "4", "--num_val_steps", "1",
            "--log_every", "2", "--progress_frames", "0",
            "--eval_chunk", "128", "--encoder", "kplanes",
            "--kp_plane_features", "4", "--kp_plane_res", "8",
            "--kp_line_res", "16", "--kp_line_features", "4",
            "--mesh_model", "2"]
    main(args + ["--max_steps", "4", "--ckpt_every", "4"])
    assert (out / "checkpoints" / "ckpt_0000004.ckpt").exists()
    main(args + ["--max_steps", "6", "--ckpt_every", "6",
                 "--resume", "latest"])
    assert (out / "checkpoints" / "ckpt_0000006.ckpt").exists()


def test_sharded_fused_eval_ipe():
    """IPE through the shard_map-fused eval path (round 5): the per-ray
    cone radii ride as an extra sharded operand. Sharded-fused ==
    single-device-fused (exact) == sharded-XLA IPE (bf16 tolerance)."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
    from nerf_sandbox_tpu.render.renderer import (
        EvalHyper, make_tile_renderer, render_rays_chunked)

    plan = make_mesh()
    model = NeRFConfig(63, 27, n_layers=3, hidden_dim=128, skip_pos=1)
    pos_b, dir_b = vanilla_encoders()
    pb, db = jnp.asarray(pos_b), jnp.asarray(dir_b)
    pc = init_nerf_params(jax.random.PRNGKey(0), model)
    pf = init_nerf_params(jax.random.PRNGKey(1), model)
    n = 256
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    radii = jax.random.uniform(jax.random.PRNGKey(3), (n,),
                               minval=1e-3, maxval=1e-2)
    args = (jnp.zeros((n, 3)), d, jnp.ones((n, 1)), d)
    base = dict(model=model, nc_eval=8, nf_eval=8, samp_near=2.0,
                samp_far=6.0, ipe=True)
    fused = EvalHyper(**base, use_pallas=True, pallas_interpret=True)
    xla = EvalHyper(**base)
    t_fm = make_tile_renderer(fused, pb, db, plan=plan)
    t_f1 = make_tile_renderer(fused, pb, db)
    t_xm = make_tile_renderer(xla, pb, db, plan=plan)
    o_fm = render_rays_chunked(t_fm, pc, pf, *args, eval_chunk=128,
                               radii=radii)
    o_f1 = render_rays_chunked(t_f1, pc, pf, *args, eval_chunk=128,
                               radii=radii)
    o_xm = render_rays_chunked(t_xm, pc, pf, *args, eval_chunk=128,
                               radii=radii)
    np.testing.assert_allclose(np.asarray(o_fm["rgb"]),
                               np.asarray(o_f1["rgb"]), atol=2e-5,
                               err_msg="ipe fused mesh vs 1-dev")
    np.testing.assert_allclose(np.asarray(o_fm["rgb"]),
                               np.asarray(o_xm["rgb"]), atol=3e-2,
                               err_msg="ipe fused vs xla")
