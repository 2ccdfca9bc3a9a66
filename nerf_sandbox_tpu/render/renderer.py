"""Full-image (eval) rendering: coarse+fine, tiled, jitted.

Parity target: ``nerf_sandbox/source/utils/render_utils.py:285-527``
(``render_image_chunked`` / ``render_pose``): uniform coarse z (optional
perturb), deterministic inverse-CDF fine sampling on averaged interval
weights, fine pass writes rgb/acc/depth; WORLD unit viewdirs feed the MLP
while marching happens in world or NDC space.

TPU-first redesign: one jitted fixed-shape tile program (compiled once per
(tile, Nc, Nf) signature) instead of a Python loop of eager chunks.  Rays
are padded to a whole number of tiles; on a mesh the tile batch is sharded
over ``data`` so a full-image render uses every chip.  ``eval_chunk`` keeps
its reference meaning as the per-tile ray count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.core.rays import get_camera_rays_grid
from nerf_sandbox_tpu.core.sampling import (
    merge_z_samples, perturb_z_samples, resample_midpoints, sample_pdf,
    stratified_samples)
from nerf_sandbox_tpu.models.forward import nerf_forward_pass
from nerf_sandbox_tpu.models.mlp import NeRFConfig
from jax.sharding import PartitionSpec as P

from nerf_sandbox_tpu.parallel.mesh import MeshPlan, shard_batch_constraint


class EvalHyper(NamedTuple):
    """Static eval configuration (hashable → one compile per signature)."""

    model: NeRFConfig
    nc_eval: int = 64
    nf_eval: int = 128
    white_bkgd: bool = True
    sigma_activation: str = "relu"
    infinite_last_bin: bool = True
    samp_near: float = 2.0
    samp_far: float = 6.0
    perturb: bool = False
    pos_include_input: bool = True
    dir_include_input: bool = True
    compute_dtype: str = "bfloat16"
    # Fused Pallas ray-march (encode+MLP+composite in one VMEM-resident
    # kernel, ops/fused_raymarch.py): 1.34x the XLA eval path on v5e
    # (42 vs 56 ms per 16384x192 pass) — the default on TPU.
    use_pallas: bool = False
    # Fine-ray culling: refine only the ceil(frac*T) rays with the highest
    # coarse opacity; the rest keep the coarse composite (identical result
    # for empty-background rays). In occupancy mode: evaluate the model on
    # the ceil(frac*T) rays with the most occupied probe bins; the rest
    # composite directly to background (the grid certified them empty).
    # 1.0 = reference semantics (refine all).
    eval_fine_frac: float = 1.0
    # Early ray termination inside the fused kernel: skip a ray tile's
    # remaining sample chunks once every ray's transmittance < eps (error
    # bound eps per channel). 0.0 = reference march-every-sample semantics.
    # Only affects the Pallas path (XLA eval marches everything).
    eval_ert_eps: float = 0.0
    # Run the Pallas kernel in interpret mode (CPU-mesh tests of the
    # shard_map-wrapped fused eval path; never set on TPU).
    pallas_interpret: bool = False
    pos_encoder: str = "freq"
    enc_cfg: object = None
    # "occupancy": the params_c slot of render_tile carries the occupancy
    # GRID; all nf_eval samples are placed from it (one model eval per ray).
    # "proposal": the params_c slot carries the small proposal MLP, whose
    # weights place all nf_eval samples (one main-model eval per ray).
    sampling_mode: str = "hierarchical"
    occ_cfg: object = None
    prop_model: object = None         # NeRFConfig of the proposal MLP
    n_prop_eval: int = 64
    # mip-NeRF 360 contraction of encoder inputs (must match training;
    # implemented in BOTH eval paths — the fused Pallas kernel applies the
    # same branchless warp to its marching points)
    scene_contraction: bool = False
    # disparity-linear coarse/proposal sample spacing (must match training)
    lindisp: bool = False
    # mip-NeRF integrated positional encoding (must match training; freq
    # encoder only; fused IN-KERNEL since round 5 — ops/fused_raymarch.py
    # streams the frustum moments and attenuates per band)
    ipe: bool = False
    # view-direction encoder (must match training). "sh" = spherical
    # harmonics; enc_dir is computed OUTSIDE the fused kernel, so the
    # Pallas eval path works with either.
    dir_encoder: str = "freq"
    sh_degree: int = 4


def make_tile_renderer(hyper: EvalHyper, pos_bands, dir_bands,
                       plan: MeshPlan | None = None):
    """→ jitted ``render_tile(params_c, params_f, ro, rd, rn, vd, key)``
    returning (rgb (T,3), acc (T,1), depth (T,1)) for a fixed tile of rays."""
    plan = plan or MeshPlan(mesh=None)
    pos_bands_np = np.asarray(pos_bands)   # concrete, for the fused kernel

    def _fused_fwd_local(params, rays_o, rays_d_unit, ray_norms, viewdirs,
                         z, t=None, radii=None):
        """Fused Pallas ray-march (ops/fused_raymarch.py) — the fast eval
        path; numerics-equivalent to the XLA branch below (bf16 compute).
        ``t``: per-ray frame times (4-D kplanes); a render has ONE time,
        so the kernel folds the space-time planes at t[0].  ``radii``:
        per-ray pixel-cone radii — enables the in-kernel IPE encode."""
        from nerf_sandbox_tpu.core.encoding import encode_dirs
        from nerf_sandbox_tpu.ops.fused_raymarch import fused_raymarch
        vn = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        vd = viewdirs / jnp.maximum(vn, 1e-12)
        enc_dir = encode_dirs(vd, dir_bands,
                              include_input=hyper.dir_include_input,
                              dir_encoder=hyper.dir_encoder,
                              sh_degree=hyper.sh_degree)
        kp = (hyper.pos_encoder == "kplanes")
        return fused_raymarch(
            params, hyper.model, rays_o, rays_d_unit, z, ray_norms, enc_dir,
            pos_bands_np, pos_include_input=hyper.pos_include_input,
            sigma_activation=hyper.sigma_activation,
            white_bkgd=hyper.white_bkgd,
            infinite_last_bin=hyper.infinite_last_bin,
            ert_eps=hyper.eval_ert_eps,
            scene_contraction=hyper.scene_contraction,
            kp_params=(params["pos_grid"] if kp else None),
            kp_cfg=(hyper.enc_cfg if kp else None),
            kp_t=(t[0] if t is not None else None),
            ipe_radii=(radii if hyper.ipe else None),
            interpret=hyper.pallas_interpret)

    if plan.mesh is not None:
        # GSPMD has no partitioning rule for Mosaic custom calls, so on a
        # mesh the kernel runs under shard_map: each device executes the
        # fused ray-march on its ray shard (rays are i.i.d. — no
        # collectives), params replicated. Per-shard ray counts are padded
        # to TILE_R inside the kernel wrapper, so any equal split works.
        data_axes = tuple(a for a in plan.mesh.axis_names if a != "model")
        spec_b = P(data_axes)

        def fused_fwd(params, rays_o, rays_d_unit, ray_norms, viewdirs, z,
                      t=None, radii=None):
            # shard_map needs an EQUAL split over the data axes (unlike the
            # GSPMD-sharded XLA branch): pad uneven tiles by repeating the
            # last ray (real math, no 0-norm hazards) and slice back — the
            # last tile of a frame and --eval_chunk values that don't
            # divide the mesh are both legal.
            D = int(np.prod([plan.mesh.shape[a] for a in data_axes]))
            T = rays_o.shape[0]
            pad = (-T) % D

            def padrow(x):
                return jnp.concatenate(
                    [x, jnp.broadcast_to(x[-1:], (pad, *x.shape[1:]))])
            if pad:
                rays_o, rays_d_unit, ray_norms, viewdirs, z = (
                    padrow(rays_o), padrow(rays_d_unit), padrow(ray_norms),
                    padrow(viewdirs), padrow(z))
                t = padrow(t) if t is not None else None
                radii = padrow(radii) if radii is not None else None
            # optional per-ray extras (frame times / IPE cone radii) ride
            # as keyword-named trailing operands so either subset shards
            keys = [k for k, v in (("t", t), ("radii", radii))
                    if v is not None]
            extras = [v for v in (t, radii) if v is not None]

            def local(p, ro, rd, rn, vd, zz, *ex):
                return _fused_fwd_local(p, ro, rd, rn, vd, zz,
                                        **dict(zip(keys, ex)))

            f = jax.shard_map(
                local, mesh=plan.mesh,
                in_specs=(P(), spec_b, spec_b, spec_b, spec_b, spec_b)
                         + (spec_b,) * len(extras),
                out_specs=(spec_b, spec_b, spec_b, spec_b),
                check_vma=False)
            out = f(params, rays_o, rays_d_unit, ray_norms, viewdirs, z,
                    *extras)
            if pad:
                out = tuple(o[:T] for o in out)
            return out
    else:
        fused_fwd = _fused_fwd_local

    @jax.jit
    def render_tile(params_c, params_f, rays_o, rays_d_unit, ray_norms,
                    viewdirs, key, radii=None, t=None):
        from nerf_sandbox_tpu.parallel.dist import replicate_outputs_constraint
        out = _render_tile_core(params_c, params_f, rays_o, rays_d_unit,
                                ray_norms, viewdirs, key, radii, t)
        # multi-process: the host (every process) reads these into PNGs, so
        # they must be fully addressable — one all-gather, no-op otherwise
        return replicate_outputs_constraint(plan, out)

    def _render_tile_core(params_c, params_f, rays_o, rays_d_unit, ray_norms,
                          viewdirs, key, radii=None, t=None):
        T = rays_o.shape[0]
        (rays_o, rays_d_unit, ray_norms, viewdirs) = shard_batch_constraint(
            plan, (rays_o, rays_d_unit, ray_norms, viewdirs))
        if hyper.ipe:
            assert radii is not None, "EvalHyper.ipe needs per-ray radii"
            (radii,) = shard_batch_constraint(plan, (radii,))
        dynamic = getattr(hyper.enc_cfg, "time_res", 0) > 0 \
            and hyper.pos_encoder == "kplanes"
        if dynamic:
            assert t is not None, "4-D kplanes eval needs per-ray times"
            (t,) = shard_batch_constraint(plan, (t,))
        else:
            t = None

        def forward_rays(params, ro, rd, rn, vd, z, rad=None, tt=None):
            if hyper.use_pallas:
                return fused_fwd(params, ro, rd, rn, vd, z, t=tt,
                                 radii=(rad if hyper.ipe else None))
            return nerf_forward_pass(
                params, hyper.model, ro, rd, z,
                pos_bands=pos_bands, dir_bands=dir_bands,
                pos_include_input=hyper.pos_include_input,
                dir_include_input=hyper.dir_include_input,
                white_bkgd=hyper.white_bkgd, ray_norms=rn,
                viewdirs_world_unit=vd,
                sigma_activation=hyper.sigma_activation,
                dir_encoder=hyper.dir_encoder, sh_degree=hyper.sh_degree,
                infinite_last_bin=hyper.infinite_last_bin,
                compute_dtype=jnp.dtype(hyper.compute_dtype),
                pos_encoder=hyper.pos_encoder, enc_cfg=hyper.enc_cfg,
                scene_contraction=hyper.scene_contraction,
                ipe=hyper.ipe, radii=rad, t=tt)

        def forward(params, z):
            return forward_rays(params, rays_o, rays_d_unit, ray_norms,
                                viewdirs, z, radii, t)

        if hyper.sampling_mode == "occupancy":
            from nerf_sandbox_tpu.models.occupancy import ray_probe_weights
            occ_grid = params_c          # grid rides in the coarse-model slot
            probe_z, probe_w = ray_probe_weights(
                occ_grid, hyper.occ_cfg, rays_o, rays_d_unit, ray_norms,
                hyper.samp_near, hyper.samp_far)

            frac = float(hyper.eval_fine_frac)
            if 0.0 < frac < 1.0:
                # Empty-ray culling (occupancy analogue of the hierarchical
                # eval_fine_frac block below): evaluate the model only on
                # the K rays whose occupancy probe crossed the most occupied
                # cells; the rest composite directly to background. A ray
                # with ZERO occupied probe bins would otherwise spend
                # nf_eval model evals on explore-floor samples in certified-
                # empty space and composite to ~background anyway — the
                # grid already proved there is nothing to integrate.
                m = 8 * plan.n_devices
                K = min(T, max(m, -(-int(T * frac) // m) * m))
                # probe_w = occupied + explore floor (occupancy.py:94-97):
                # its row sum is monotone in the occupied-bin count.
                order = jnp.argsort(-jnp.sum(probe_w, axis=-1))
                top = order[:K]
                z = jnp.sort(sample_pdf(probe_z[top], probe_w[top],
                                        hyper.nf_eval, deterministic=True),
                             axis=-1)
                comp_s, _, acc_s, depth_s = forward_rays(
                    params_f, rays_o[top], rays_d_unit[top],
                    ray_norms[top], viewdirs[top], z,
                    radii[top] if hyper.ipe else None,
                    t[top] if t is not None else None)
                bg = 1.0 if hyper.white_bkgd else 0.0
                comp = jnp.full((T, 3), bg, comp_s.dtype).at[top].set(comp_s)
                acc = jnp.zeros((T, 1), acc_s.dtype).at[top].set(acc_s)
                depth = jnp.zeros((T, 1), depth_s.dtype).at[top].set(depth_s)
                return comp, acc, depth

            z = jnp.sort(sample_pdf(probe_z, probe_w, hyper.nf_eval,
                                    deterministic=True), axis=-1)
            comp, _, acc, depth = forward(params_f, z)
            return comp, acc, depth

        if hyper.sampling_mode == "proposal":
            # proposal MLP rides in the coarse slot; always freq-encoded XLA
            # (tiny model — the fused kernel serves the MAIN forward below).
            # Only w_p is consumed → XLA DCEs the color branch under jit.
            zp = jnp.broadcast_to(
                stratified_samples(hyper.samp_near, hyper.samp_far,
                                   hyper.n_prop_eval, lindisp=hyper.lindisp),
                (T, hyper.n_prop_eval))
            _, w_p, _, _ = nerf_forward_pass(
                params_c, hyper.prop_model, rays_o, rays_d_unit, zp,
                pos_bands=pos_bands, dir_bands=dir_bands,
                pos_include_input=hyper.pos_include_input,
                dir_include_input=hyper.dir_include_input,
                white_bkgd=hyper.white_bkgd, ray_norms=ray_norms,
                viewdirs_world_unit=viewdirs,
                sigma_activation=hyper.sigma_activation,
                dir_encoder=hyper.dir_encoder, sh_degree=hyper.sh_degree,
                infinite_last_bin=hyper.infinite_last_bin,
                compute_dtype=jnp.dtype(hyper.compute_dtype),
                scene_contraction=hyper.scene_contraction,
                ipe=hyper.ipe, radii=radii)
            z = jnp.sort(resample_midpoints(zp, w_p, hyper.nf_eval,
                                            deterministic=True), axis=-1)
            comp, _, acc, depth = forward(params_f, z)
            return comp, acc, depth

        z = jnp.broadcast_to(
            stratified_samples(hyper.samp_near, hyper.samp_far, hyper.nc_eval,
                               lindisp=hyper.lindisp),
            (T, hyper.nc_eval))
        if hyper.perturb:
            z = perturb_z_samples(key, z)

        comp_c, w_c, acc_c, depth_c = forward(params_c, z)
        if hyper.nf_eval <= 0 or params_f is None:
            return comp_c, acc_c, depth_c

        frac = float(hyper.eval_fine_frac)
        if 0.0 < frac < 1.0:
            # Fine-ray culling: refine only the K rays with the highest
            # coarse opacity. Row gathers/scatters of whole rays are cheap
            # on TPU (contiguous DMA, measured ~0.01 ms at (32k,128)) —
            # unlike the per-sample axis-1 gathers sample_pdf avoids.
            # K rounds to 8·n_devices so the culled subset still splits
            # evenly across the mesh for the shard_map'd fused kernel.
            m = 8 * plan.n_devices
            K = min(T, max(m, -(-int(T * frac) // m) * m))
            order = jnp.argsort(-acc_c[:, 0])
            top = order[:K]
            ro_s, rd_s = rays_o[top], rays_d_unit[top]
            rn_s, vd_s = ray_norms[top], viewdirs[top]
            z_s, w_s = z[top], w_c[top]

            zf = resample_midpoints(z_s, w_s, hyper.nf_eval,
                                    deterministic=True)
            z_all = merge_z_samples(z_s, zf)
            comp_s, _, acc_s, depth_s = forward_rays(
                params_f, ro_s, rd_s, rn_s, vd_s, z_all,
                radii[top] if hyper.ipe else None,
                t[top] if t is not None else None)
            comp_f = comp_c.at[top].set(comp_s)
            acc_f = acc_c.at[top].set(acc_s)
            depth_f = depth_c.at[top].set(depth_s)
            return comp_f, acc_f, depth_f

        zf = resample_midpoints(z, w_c, hyper.nf_eval, deterministic=True)
        z_all = merge_z_samples(z, zf)

        comp_f, _, acc_f, depth_f = forward(params_f, z_all)
        return comp_f, acc_f, depth_f

    return render_tile


def render_rays_chunked(render_tile, params_c, params_f, rays_o, rays_d_unit,
                        ray_norms, viewdirs, *, eval_chunk: int = 16384,
                        key=None, radii=None, t=None) -> dict:
    """Render an arbitrary number of rays by padding into fixed tiles."""
    n = rays_o.shape[0]
    tile = min(int(eval_chunk), n) if eval_chunk else n
    n_pad = (-n) % tile
    if key is None:
        key = jax.random.PRNGKey(0)

    # Pad by WRAPPING the leading rays (n_pad < tile <= n): synthetic
    # degenerate rays could out-rank real rays in the eval_fine_frac
    # culling (an origin +z probe ray composites high acc and steals
    # refine slots from the last partial tile); duplicated real rays rank
    # exactly like their originals and their outputs are sliced off.
    def pad(x):
        return jnp.concatenate([x, x[:n_pad]]) if n_pad else x

    ro, rd = pad(rays_o), pad(rays_d_unit)
    rn = pad(ray_norms.reshape(n, 1))
    vd = pad(viewdirs)
    ra = pad(radii.reshape(n, 1)) if radii is not None else None
    tt = pad(t.reshape(n)) if t is not None else None

    outs = {"rgb": [], "acc": [], "depth": []}
    for i in range(0, n + n_pad, tile):
        key, sub = jax.random.split(key)
        rgb, acc, depth = render_tile(
            params_c, params_f, ro[i:i + tile], rd[i:i + tile],
            rn[i:i + tile], vd[i:i + tile], sub,
            ra[i:i + tile] if ra is not None else None,
            tt[i:i + tile] if tt is not None else None)
        outs["rgb"].append(rgb)
        outs["acc"].append(acc)
        outs["depth"].append(depth)

    return {k: jnp.concatenate(v)[:n] for k, v in outs.items()}


def render_pose(render_tile, params_c, params_f, c2w, H: int, W: int, K, *,
                eval_chunk: int = 16384, use_ndc: bool = False,
                convention: str = "opengl", near_plane: float = 1.0,
                key=None, time: float | None = None) -> dict:
    """Render one camera pose → {rgb (H,W,3), acc (H,W,1), depth (H,W,1)}.

    WORLD rays feed the MLP's view-direction branch; marching rays are NDC
    when requested (render_utils.py:426-527 semantics). ``time``: the
    frame's normalized capture time (dynamic 4-D kplanes renderers; ignored
    by static tile renderers).
    """
    K = jnp.asarray(np.asarray(K, np.float32))
    c2w = jnp.asarray(np.asarray(c2w, np.float32))
    # One ray-gen pass: the bundle carries BOTH world fields (viewdirs for
    # the MLP) and marching fields (world or NDC-warped).
    rays = get_camera_rays_grid(K, c2w, image_h=H, image_w=W,
                                convention=convention, pixel_center=True,
                                as_ndc=use_ndc, near_plane=float(near_plane))
    # Per-ray pixel-cone radii for IPE renderers (None-safe: the tile
    # renderer ignores them unless EvalHyper.ipe; IPE is non-NDC only).
    radii = None
    if not use_ndc:
        from nerf_sandbox_tpu.core.encoding import pixel_cone_radii
        radii = pixel_cone_radii(K[0, 0], rays.d_world_norm[..., 0])
    t = None
    if time is not None:
        t = jnp.full((rays.o_march.shape[0],), float(time), jnp.float32)
    out = render_rays_chunked(render_tile, params_c, params_f,
                              rays.o_march, rays.d_march_unit,
                              rays.d_march_norm, rays.d_world_unit,
                              eval_chunk=eval_chunk, key=key, radii=radii,
                              t=t)
    return {
        "rgb": np.asarray(out["rgb"]).reshape(H, W, 3),
        "acc": np.asarray(out["acc"]).reshape(H, W, 1),
        "depth": np.asarray(out["depth"]).reshape(H, W, 1),
    }
