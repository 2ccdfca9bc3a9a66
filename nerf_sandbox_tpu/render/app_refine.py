"""Per-image test-time appearance refinement (NeRF-W evaluation protocol).

Beyond-reference capability (the torch reference has no appearance codes
at all). A model trained with ``--appearance_dim`` carries per-TRAIN-frame
codes; held-out frames have none, so eval normally folds a FIXED code
(``--eval_appearance``: table mean / zero / a train frame's) into the
color head. That mean-code approximation measurably leaves quality on the
table when the eval frame's lighting/exposure differs from the mean train
gain (RESULTS.md "Appearance embeddings": 22.22 vs the 23.13 clean
ceiling on the exposure-jittered scene).

The NeRF-W protocol (Martin-Brualla et al. 2021 §C) closes it honestly:
optimize ONLY the eval image's appearance code on the LEFT half of its
pixels against the frozen model, then report metrics on the RIGHT half —
the code can express per-frame photometric gain but not scene content, so
tuning it on half the image cannot leak geometry into the held-out half.

Design mirrors render/pose_refine.py: a standalone differentiable coarse
XLA forward (stratified z, no resample — gradient signal, not render
fidelity) inside ONE jitted ``lax.fori_loop``; camera, ground truth, seed
and frame time are traced arguments so an N-frame split pays a single
compile per static signature. The optimization variable is just the
(app_dim,) code — every model weight is frozen — and the refined code is
folded into the color head (models/mlp.py:fold_appearance) so the frame
renders through the normal fast eval path (XLA or fused Pallas, both
app-free architectures).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_sandbox_tpu.core.rays import get_camera_rays
from nerf_sandbox_tpu.core.sampling import (perturb_z_samples,
                                            stratified_samples)
from nerf_sandbox_tpu.models.forward import nerf_forward_pass


def make_appearance_refiner(hyper, pos_bands, dir_bands, *, model_cfg,
                            params_f_raw, code0):
    """→ ``refine(c2w, K, H, W, gt, *, ...)`` returning
    ``(params_f_folded, info dict)``.

    ``hyper`` is the trainer's EvalHyper (bounds/encoder fields only);
    ``model_cfg`` is the TRAIN-time NeRFConfig (``app_dim`` > 0 — the
    eval hyper's model is the already-folded app-free arch);
    ``params_f_raw`` the unfolded fine params (with the ``app_emb`` table
    and the app-widened ``color_fc``); ``code0`` the starting code (the
    trainer's ``--eval_appearance`` vector — mean by default).
    """
    if not getattr(model_cfg, "app_dim", 0):
        raise ValueError("appearance refinement needs a model trained with "
                         "--appearance_dim > 0")
    nc = int(hyper.nc_eval)
    dynamic = bool(getattr(hyper.enc_cfg, "time_res", 0)) \
        and hyper.pos_encoder == "kplanes"
    drivers: dict[tuple, callable] = {}  # static signature -> jitted driver

    def _build_driver(H_, W_, n_rays, steps, use_ndc, convention,
                      near_plane, lr):
        opt = optax.adam(optax.cosine_decay_schedule(float(lr), steps))
        half_w = max(W_ // 2, 1)

        def loss_fn(params, code, key, c2w, Kj, gt_flat, time):
            # pixels from the LEFT half only — the right half is the
            # held-out metric surface (NeRF-W half-image protocol)
            kpx = jax.random.fold_in(key, 0)
            xs = jax.random.randint(kpx, (n_rays,), 0, half_w)
            ys = jax.random.randint(jax.random.fold_in(kpx, 1),
                                    (n_rays,), 0, H_)
            px = jnp.stack([xs, ys], -1).astype(jnp.float32)
            gt_px = gt_flat[ys * W_ + xs]
            rb = get_camera_rays(Kj, c2w, px, image_h=H_, image_w=W_,
                                 convention=convention, pixel_center=True,
                                 as_ndc=use_ndc, near_plane=float(near_plane))
            z = jnp.broadcast_to(
                stratified_samples(hyper.samp_near, hyper.samp_far, nc,
                                   lindisp=hyper.lindisp), (n_rays, nc))
            z = perturb_z_samples(jax.random.fold_in(key, 2), z)
            radii = None
            if hyper.ipe:
                from nerf_sandbox_tpu.core.encoding import pixel_cone_radii
                radii = pixel_cone_radii(Kj[0, 0], rb.d_world_norm[..., 0])
            t = (jnp.broadcast_to(time.reshape(1), (n_rays,))
                 if dynamic else None)
            app = jnp.broadcast_to(code[None, :], (n_rays, code.shape[0]))
            rgb, _, _, _ = nerf_forward_pass(
                params, model_cfg, rb.o_march, rb.d_march_unit, z,
                pos_bands=pos_bands, dir_bands=dir_bands,
                pos_include_input=hyper.pos_include_input,
                dir_include_input=hyper.dir_include_input,
                white_bkgd=hyper.white_bkgd,
                ray_norms=rb.d_march_norm[..., 0],
                viewdirs_world_unit=rb.d_world_unit,
                sigma_activation=hyper.sigma_activation,
                infinite_last_bin=hyper.infinite_last_bin,
                compute_dtype=jnp.dtype(hyper.compute_dtype),
                pos_encoder=hyper.pos_encoder, enc_cfg=hyper.enc_cfg,
                scene_contraction=hyper.scene_contraction,
                ipe=hyper.ipe, radii=radii,
                dir_encoder=hyper.dir_encoder, sh_degree=hyper.sh_degree,
                app_emb=app, t=t)
            return jnp.mean((rgb - gt_px) ** 2)

        @jax.jit
        def driver(params, c0, c2w, Kj, gt_flat, seed, time):
            key0 = jax.random.fold_in(jax.random.PRNGKey(0), seed)

            def body(i, carry):
                code, st = carry
                key = jax.random.fold_in(key0, i)
                g = jax.grad(loss_fn, argnums=1)(
                    params, code, key, c2w, Kj, gt_flat, time)
                upd, st = opt.update(g, st, code)
                return optax.apply_updates(code, upd), st

            code, _ = jax.lax.fori_loop(0, steps, body, (c0, opt.init(c0)))
            # paired photometric probe (same pixel subset before/after)
            probe = jax.random.fold_in(key0, steps)
            return (code,
                    loss_fn(params, code, probe, c2w, Kj, gt_flat, time),
                    loss_fn(params, c0, probe, c2w, Kj, gt_flat, time))

        return driver

    code0 = jnp.asarray(code0, jnp.float32).reshape(model_cfg.app_dim)

    def refine(c2w, K, H, W, gt, *, use_ndc=False, convention="opengl",
               near_plane=1.0, steps=100, lr=1e-2, rays=1024, seed=0,
               time=0.0):
        sig = (int(H), int(W), int(rays), int(steps), bool(use_ndc),
               str(convention or "opengl"), float(near_plane), float(lr))
        if sig not in drivers:
            drivers[sig] = _build_driver(*sig)
        driver = drivers[sig]

        c2wj = jnp.asarray(np.asarray(c2w, np.float32))[:3, :4]
        Kj = jnp.asarray(np.asarray(K, np.float32))
        gt_flat = jnp.asarray(np.asarray(gt, np.float32).reshape(-1, 3))
        code, mse_final, mse_init = driver(
            params_f_raw, code0, c2wj, Kj, gt_flat,
            jnp.asarray(int(seed), jnp.uint32),
            jnp.asarray(float(time), jnp.float32))
        from nerf_sandbox_tpu.models.mlp import fold_appearance
        folded, _ = fold_appearance(params_f_raw, model_cfg, code)
        return folded, {"code": np.asarray(code),
                        "code_delta_norm": float(
                            jnp.linalg.norm(code - code0)),
                        "mse_init": float(mse_init),
                        "mse_final": float(mse_final)}

    return refine
