"""Mesh extraction (--export_mesh): marching tetrahedra + density sweep.

Beyond-reference capability (the torch reference has no geometry export).
Contracts pinned here:

* geometric accuracy: on an analytic sphere field every extracted vertex
  sits within one cell diagonal of the true radius;
* watertightness: every undirected surface edge is shared by EXACTLY two
  triangles (the marching-tetrahedra guarantee — this catches any case-
  table/orientation bug);
* outward winding: face normals point away from the dense inside;
* empty/full fields produce empty meshes; degenerate faces are dropped;
* the density sweep runs the real model path (encoders, activations) and
  the CLI writes a parseable OBJ end to end.
"""

import numpy as np
import pytest

from nerf_sandbox_tpu.render.mesh import (export_obj, marching_tetrahedra,
                                          query_density_grid)


def _sphere_grid(res=24, r=0.6, lo=-1.0, hi=1.0):
    ax = np.linspace(lo, hi, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    # density high inside the sphere, 0 outside: level 0.5 -> |x| = r
    return 1.0 - np.sqrt(X**2 + Y**2 + Z**2) / r


def test_sphere_vertices_on_radius():
    res, r = 24, 0.6
    grid = _sphere_grid(res, r)
    verts, faces = marching_tetrahedra(grid, 0.0, (-1, -1, -1), (1, 1, 1))
    assert len(verts) > 100 and len(faces) > 100
    cell_diag = np.sqrt(3.0) * 2.0 / (res - 1)
    rad = np.linalg.norm(verts, axis=-1)
    assert float(np.abs(rad - r).max()) < cell_diag
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_watertight_every_edge_shared_twice():
    grid = _sphere_grid(20, 0.55)
    verts, faces = marching_tetrahedra(grid, 0.0, (-1, -1, -1), (1, 1, 1))
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), np.unique(counts)


def test_outward_winding():
    """Sphere centered at origin: face normals must point away from it."""
    grid = _sphere_grid(20, 0.55)
    verts, faces = marching_tetrahedra(grid, 0.0, (-1, -1, -1), (1, 1, 1))
    tri = verts[faces]                                   # (F, 3, 3)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    c = tri.mean(axis=1)
    out_frac = float(((n * c).sum(-1) > 0).mean())
    assert out_frac > 0.99, out_frac


def test_empty_and_full_fields():
    z = np.zeros((8, 8, 8), np.float32)
    v, f = marching_tetrahedra(z, 0.5, (-1, -1, -1), (1, 1, 1))
    assert len(v) == 0 and len(f) == 0
    v, f = marching_tetrahedra(z + 1.0, 0.5, (-1, -1, -1), (1, 1, 1))
    assert len(v) == 0 and len(f) == 0


def test_non_cubic_lattice_and_box():
    """Anisotropic resolution + box: vertices still land on the surface."""
    res = (16, 24, 32)
    lo, hi = np.array([-1.0, -2.0, 0.0]), np.array([1.0, 2.0, 4.0])
    axes = [np.linspace(lo[i], hi[i], res[i], dtype=np.float32)
            for i in range(3)]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    c = np.array([0.0, 0.0, 2.0])
    r = 0.8
    grid = 1.0 - np.sqrt((X - c[0])**2 + (Y - c[1])**2 + (Z - c[2])**2) / r
    verts, faces = marching_tetrahedra(grid, 0.0, lo, hi)
    assert len(faces) > 50
    rad = np.linalg.norm(verts - c, axis=-1)
    cell_diag = np.linalg.norm((hi - lo) / (np.array(res) - 1))
    assert float(np.abs(rad - r).max()) < cell_diag


def test_query_density_grid_matches_model():
    """The lattice sweep equals a direct forward at the same points."""
    import jax
    import jax.numpy as jnp
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.mlp import (NeRFConfig, init_nerf_params,
                                             nerf_apply)
    from nerf_sandbox_tpu.core.encoding import positional_encoding
    cfg = NeRFConfig(63, 27, n_layers=2, hidden_dim=32, skip_pos=1)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg,
                              initial_acc_opacity=0.5,
                              sigma_activation="softplus")
    pos_b, dir_b = vanilla_encoders()
    res = 7
    grid = query_density_grid(params, cfg, jnp.asarray(pos_b),
                              jnp.asarray(dir_b), res=res,
                              lo=(-1, -1, -1), hi=(1, 1, 1),
                              sigma_activation="softplus", chunk=100)
    ax = np.linspace(-1, 1, res, dtype=np.float32)
    pts = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    enc = positional_encoding(jnp.asarray(pts), jnp.asarray(pos_b))
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), pts.shape)
    enc_d = positional_encoding(d, jnp.asarray(dir_b))
    raw = nerf_apply(params, cfg, enc, enc_d)[:, 3]
    expect = np.asarray(jax.nn.softplus(raw)).reshape(res, res, res)
    np.testing.assert_allclose(grid, expect, rtol=1e-5, atol=1e-6)
    assert (grid > 0).all()   # softplus + acc-opacity bias init


def test_obj_writer_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    p = tmp_path / "m.obj"
    export_obj(p, verts, faces)
    lines = p.read_text().splitlines()
    assert sum(ln.startswith("v ") for ln in lines) == 3
    assert [ln for ln in lines if ln.startswith("f ")] == ["f 1 2 3"]


def test_cli_export_mesh(tmp_path, capsys):
    from nerf_sandbox_tpu.scripts.train_nerf import main
    from tests.test_loaders import _make_blender
    scene = _make_blender(tmp_path / "scene", n_frames=2, size=12)
    out = tmp_path / "exp"
    main(["--data_root", str(scene), "--data_kind", "blender",
          "--out_dir", str(out), "--export_mesh", "true",
          "--mesh_res", "12", "--mesh_thr", "0.5",
          "--initial_acc_opacity", "0.5", "--sigma_activation", "softplus",
          "--n_layers", "2", "--hidden_dim", "32", "--skip_pos", "1",
          "--rays_per_batch", "32", "--nc", "4", "--nf", "8",
          "--num_val_steps", "1", "--log_every", "8",
          "--progress_frames", "0", "--eval_chunk", "128",
          "--max_steps", "8", "--ckpt_every", "8"])
    txt = capsys.readouterr().out
    assert "[MESH] wrote" in txt
    objs = list((out / "mesh").glob("mesh_step_*.obj"))
    assert len(objs) == 1
    body = objs[0].read_text()
    assert body.startswith("# nerf-sandbox-tpu mesh:")
