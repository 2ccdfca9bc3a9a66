"""Test-time camera refinement for held-out evaluation (BARF protocol).

Beyond-reference capability. When a model was trained with ``--pose_opt``
the learned scene lives in a slightly different rigid frame than the raw
dataset poses (gauge freedom: the train-pose deltas and the field drift
together). The BARF / NeRF-- evaluation protocol therefore optimizes a
per-test-camera se3 delta against the FROZEN model's photometric loss
before computing PSNR; without it, held-out metrics penalize the gauge,
not the reconstruction (Lin et al. 2021 §4, "test-time photometric
optimization"; training-time deltas live in core/pose.py).

Design: a standalone differentiable coarse forward — always the XLA path
(the fused Pallas eval kernel has no VJP) — on the FINE model params:
stratified z, no hierarchical resample, no occupancy culling. Alignment
needs gradient signal, not final-render fidelity; the refined pose is
then rendered through the normal (fast) eval path.

Four details matter for convergence (all established empirically on the
sphere-scene recovery test, 3° and 5° orientation jitter):

* **Camera-centered chart** (``apply_cam_delta``), NOT the training-time
  world-frame left composition. In the world chart a pure orientation
  error of angle θ needs a compensating translation ‖t‖·θ (≈0.2 for a
  camera 4 units out), so the rotate↔translate photometric gauge valley
  is maximally coupled and Adam drifts AWAY from the truth while the
  loss drops (the shipped round-3 refiner's measured failure: full-image
  deterministic descent converged 3.7× further from the true pose). In
  the camera chart orientation and position decouple and descent
  recovers the pose.
* **Cosine-decayed Adam.** Adam steps ~lr per coordinate regardless of
  gradient magnitude, so near-ambiguous directions random-walk under
  ray-subset noise; decaying to 0 bounds the accumulated drift
  (measured: 0.172 → 0.077 pose error on the same budget).
* **Per-iteration z jitter** (``perturb_z_samples``), so the fixed
  16-sample stratified comb doesn't bake one aliasing pattern into the
  surrogate loss.
* **A small prior** ``prior_weight·‖delta‖²`` anchoring the remaining
  null-space drift (the jitter-is-small MAP prior; well-determined
  directions still move — the photometric term dominates them).

NO encoder-band annealing: BARF's coarse-to-fine applies when the model
co-trains with the poses. Against a FROZEN full-frequency model, zeroed
high bands are out-of-distribution inputs and the gradient points at
garbage (measured: anneal moves the pose 2× further away than plain
descent). ``--pose_opt`` training still anneals (--barf_anneal_steps).

Cost: ONE jitted ``lax.fori_loop`` per static signature — the camera,
intrinsics, ground truth, seed, and frame time are traced ARGUMENTS, so
an N-frame split pays a single compile (drivers cached per
(H, W, rays, steps, lr, ...) signature).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_sandbox_tpu.core.pose import apply_cam_delta
from nerf_sandbox_tpu.core.rays import get_camera_rays
from nerf_sandbox_tpu.core.sampling import (perturb_z_samples,
                                            stratified_samples)
from nerf_sandbox_tpu.models.forward import nerf_forward_pass


def make_pose_refiner(hyper, pos_bands, dir_bands):
    """→ ``refine(params_f, c2w, K, H, W, gt, *, ...)`` returning
    ``(c2w_refined (3,4) np.ndarray, info dict)``.

    ``hyper`` is the trainer's EvalHyper; only its model/encoder/bounds
    fields are used (sampling-mode and Pallas flags are ignored — the
    refiner is its own coarse XLA forward on the fine model).
    """
    nc = int(hyper.nc_eval)
    dynamic = bool(getattr(hyper.enc_cfg, "time_res", 0)) \
        and hyper.pos_encoder == "kplanes"
    drivers: dict[tuple, callable] = {}  # static signature -> jitted driver

    def _build_driver(H_, W_, n_rays, steps, use_ndc, convention,
                      near_plane, lr, prior_weight):
        opt = optax.adam(optax.cosine_decay_schedule(float(lr), steps))

        def loss_fn(params, delta, key, c2w0, Kj, gt_flat, time):
            kpx = jax.random.fold_in(key, 0)
            xs = jax.random.randint(kpx, (n_rays,), 0, W_)
            ys = jax.random.randint(jax.random.fold_in(kpx, 1),
                                    (n_rays,), 0, H_)
            px = jnp.stack([xs, ys], -1).astype(jnp.float32)
            gt_px = gt_flat[ys * W_ + xs]
            rb = get_camera_rays(Kj, apply_cam_delta(c2w0, delta), px,
                                 image_h=H_, image_w=W_,
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
            rgb, _, _, _ = nerf_forward_pass(
                params, hyper.model, rb.o_march, rb.d_march_unit, z,
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
                t=t)
            return jnp.mean((rgb - gt_px) ** 2)

        def objective(params, delta, key, c2w0, Kj, gt_flat, time):
            return (loss_fn(params, delta, key, c2w0, Kj, gt_flat, time)
                    + prior_weight * jnp.sum(delta ** 2))

        @jax.jit
        def driver(params, d0, c2w0, Kj, gt_flat, seed, time):
            key0 = jax.random.fold_in(jax.random.PRNGKey(0), seed)

            def body(i, carry):
                delta, st = carry
                key = jax.random.fold_in(key0, i)
                g = jax.grad(objective, argnums=1)(
                    params, delta, key, c2w0, Kj, gt_flat, time)
                upd, st = opt.update(g, st, delta)
                return optax.apply_updates(delta, upd), st

            delta, _ = jax.lax.fori_loop(0, steps, body, (d0, opt.init(d0)))
            # photometric-only probe (no prior term), same pixel subset
            # for before/after so the improvement readout is paired
            probe = jax.random.fold_in(key0, steps)
            return (delta,
                    loss_fn(params, delta, probe, c2w0, Kj, gt_flat, time),
                    loss_fn(params, d0, probe, c2w0, Kj, gt_flat, time))

        return driver

    def refine(params_f, c2w, K, H, W, gt, *, use_ndc=False,
               convention="opengl", near_plane=1.0, steps=100, lr=5e-3,
               rays=1024, seed=0, time=0.0, prior_weight=0.1):
        sig = (int(H), int(W), int(rays), int(steps), bool(use_ndc),
               str(convention or "opengl"), float(near_plane), float(lr),
               float(prior_weight))
        if sig not in drivers:
            drivers[sig] = _build_driver(*sig)
        driver = drivers[sig]

        c2w0 = jnp.asarray(np.asarray(c2w, np.float32))[:3, :4]
        Kj = jnp.asarray(np.asarray(K, np.float32))
        gt_flat = jnp.asarray(np.asarray(gt, np.float32).reshape(-1, 3))
        delta, mse_final, mse_init = driver(
            params_f, jnp.zeros(6, jnp.float32), c2w0, Kj, gt_flat,
            jnp.asarray(int(seed), jnp.uint32),
            jnp.asarray(float(time), jnp.float32))
        c2w_ref = np.asarray(apply_cam_delta(c2w0, delta))
        return c2w_ref, {"delta": np.asarray(delta),
                         "mse_init": float(mse_init),
                         "mse_final": float(mse_final)}

    return refine
