"""Stateless NeRF march + composite at fixed z samples (the XLA reference path).

Parity target: ``nerf_sandbox/source/utils/render_utils.py:171-283``
(``nerf_forward_pass``):

* points ``pts = o + d_unit * (z * ||d_raw||)`` (:209-215)
* view directions = unit WORLD dirs broadcast per sample (:217-223)
* encode → MLP → sigmoid(rgb); train-time Gaussian sigma noise added to the
  RAW sigma logits before the relu/softplus activation (:239-246)
* composite via ``volume_render_rays`` with z kept in z units (:267-276)

TPU-first differences: a single fused XLA program (no ``mlp_chunk`` host
loop — chunking is an OOM workaround the reference needed on small GPUs;
on TPU the ray batch itself is the tile unit and is sharded over the mesh).
The noise is drawn from a threaded PRNG key in fp32 (matching the
reference's fp32-noise-under-AMP detail, render_utils.py:239-241).

``ops/fused_mlp.py`` provides a Pallas-fused MLP for the eval path; this
XLA version is the correctness oracle and autodiff fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerf_sandbox_tpu.core.encoding import positional_encoding
from nerf_sandbox_tpu.core.integrator import volume_render_rays
from nerf_sandbox_tpu.models.mlp import NeRFConfig, nerf_apply


def nerf_forward_pass(
    params,
    cfg: NeRFConfig,
    rays_o: jnp.ndarray,            # (B, 3) marching-space origins
    rays_d_unit: jnp.ndarray,       # (B, 3) unit marching dirs
    z_vals: jnp.ndarray,            # (B, N) sorted
    *,
    pos_bands: jnp.ndarray,         # (Fp,)
    dir_bands: jnp.ndarray,         # (Fd,)
    pos_include_input: bool = True,
    dir_include_input: bool = True,
    white_bkgd: bool,
    ray_norms: jnp.ndarray | None = None,       # (B,) or (B,1): ||d_raw||
    viewdirs_world_unit: jnp.ndarray | None = None,  # (B,3)
    sigma_activation: str = "relu",
    raw_noise_std: float = 0.0,
    noise_key: jax.Array | None = None,
    infinite_last_bin: bool = False,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    pos_encoder: str = "freq",       # "freq" | "hashgrid" | "kplanes"
    enc_cfg=None,                    # HashGridConfig | KPlanesConfig
    scene_contraction: bool = False,
    ipe: bool = False,               # mip-NeRF integrated positional encoding
    radii: jnp.ndarray | None = None,   # (B,) or (B,1) pixel-cone radii
    app_emb: jnp.ndarray | None = None,  # (B, app_dim) per-ray appearance codes
    dir_encoder: str = "freq",       # "freq" | "sh" (spherical harmonics)
    sh_degree: int = 4,
    pe_band_weights: jnp.ndarray | None = None,  # (Fp,) BARF anneal weights
    t: jnp.ndarray | None = None,    # (B,) normalized times (4-D kplanes)
):
    """Returns (composite_rgb (B,3), weights (B,N), acc (B,1), depth (B,1))."""
    B, N = z_vals.shape

    if ray_norms is None:
        z_metric = z_vals
    else:
        z_metric = z_vals * ray_norms.reshape(B, 1)
    pts = rays_o[:, None, :] + rays_d_unit[:, None, :] * z_metric[..., None]  # (B,N,3)

    ipe_gaussian = None
    if ipe:
        # mip-NeRF: each sample becomes a conical-frustum Gaussian over its
        # integration interval (core/encoding.py:z_to_intervals) and the
        # positional encoding becomes its expectation — the encoder is
        # scale-aware (anti-aliased). freq encoder only; the trainer gates.
        assert pos_encoder == "freq", "IPE applies to the freq encoder only"
        assert radii is not None, "IPE needs per-ray pixel-cone radii"
        from nerf_sandbox_tpu.core.encoding import (
            conical_frustum_moments, contract_gaussian,
            lift_gaussian_diag, z_to_intervals)
        lower, upper = z_to_intervals(z_metric)
        t_mean, t_var, r_var = conical_frustum_moments(
            lower, upper, radii.reshape(B, 1))
        mean, var = lift_gaussian_diag(rays_d_unit, t_mean, t_var, r_var,
                                       rays_o)
        if scene_contraction:
            # linearized contraction of the Gaussian (mip-NeRF 360 §3.3),
            # exact-diag via the axial/radial rank structure — see
            # contract_gaussian's docstring for why diag-first is ~r× wrong
            mean, var = contract_gaussian(mean, rays_d_unit, t_var, r_var)
        ipe_gaussian = (mean, var)
    elif scene_contraction:
        # mip-NeRF 360 contraction: encode in the radius-2 contracted ball
        # (z/depth integration stays metric — only the ENCODER sees the
        # warped coordinates). Grid encoders must cover [-2,2]^3
        # (aabb_scale=2; the trainer auto-sets this).
        from nerf_sandbox_tpu.core.encoding import scene_contract
        pts = scene_contract(pts)

    if viewdirs_world_unit is not None:
        vn = jnp.linalg.norm(viewdirs_world_unit, axis=-1, keepdims=True)
        vdirs = viewdirs_world_unit / jnp.maximum(vn, 1e-12)
    else:
        vdirs = rays_d_unit
    vdirs = jnp.broadcast_to(vdirs[:, None, :], pts.shape)                    # (B,N,3)

    # Encode in fp32 (sin/cos of large 2^k x args need fp32 mantissa), then
    # run the MLP in compute_dtype (bf16 on TPU = the AMP-equivalent mode).
    if ipe_gaussian is not None:
        from nerf_sandbox_tpu.core.encoding import (
            integrated_positional_encoding)
        mean, var = ipe_gaussian
        enc_pos = integrated_positional_encoding(
            mean.reshape(-1, 3), var.reshape(-1, 3), pos_bands,
            include_input=pos_include_input)
    elif pos_encoder == "hashgrid":
        from nerf_sandbox_tpu.models.hashgrid import hash_encode
        enc_pos = hash_encode(params["pos_grid"], pts.reshape(-1, 3), enc_cfg)
    elif pos_encoder == "kplanes":
        from nerf_sandbox_tpu.models.kplanes import kplanes_encode
        t01 = None
        if getattr(enc_cfg, "time_res", 0) > 0:
            assert t is not None, "4-D kplanes (time_res > 0) needs times"
            # every sample along a ray shares the ray's frame time
            t01 = jnp.broadcast_to(t.reshape(B, 1), (B, N)).reshape(-1)
        enc_pos = kplanes_encode(params["pos_grid"], pts.reshape(-1, 3),
                                 enc_cfg, compute_dtype=compute_dtype,
                                 t01=t01)
    else:
        enc_pos = positional_encoding(pts.reshape(-1, 3), pos_bands,
                                      include_input=pos_include_input,
                                      band_weights=pe_band_weights)
    from nerf_sandbox_tpu.core.encoding import encode_dirs
    enc_dir = encode_dirs(vdirs.reshape(-1, 3), dir_bands,
                          include_input=dir_include_input,
                          dir_encoder=dir_encoder, sh_degree=sh_degree)

    app = None
    if app_emb is not None:
        # per-ray NeRF-W appearance codes, broadcast per-sample (the whole
        # ray shares its frame's code). Eval paths never reach here — they
        # fold a fixed code into the color head (mlp.py:fold_appearance).
        assert cfg.app_dim and app_emb.shape[-1] == cfg.app_dim
        app = jnp.broadcast_to(app_emb[:, None, :],
                               (B, N, cfg.app_dim)).reshape(-1, cfg.app_dim)

    if use_pallas:
        from nerf_sandbox_tpu.ops.fused_mlp import fused_nerf_apply
        assert not cfg.app_dim, \
            "fused MLP has no appearance branch; fold_appearance first"
        out = fused_nerf_apply(params, cfg, enc_pos, enc_dir)                 # (Q,4)
    else:
        mlp_dtype = None if compute_dtype == jnp.float32 else compute_dtype
        out = nerf_apply(params, cfg, enc_pos, enc_dir,
                         compute_dtype=mlp_dtype, app=app)                    # (Q,4)
    rgb = jax.nn.sigmoid(out[..., :3])
    sigma = out[..., 3]

    if raw_noise_std > 0.0 and noise_key is not None:
        noise = jax.random.normal(noise_key, sigma.shape, dtype=jnp.float32)
        sigma = sigma + (noise * raw_noise_std).astype(sigma.dtype)

    if sigma_activation == "softplus":
        sigma = jax.nn.softplus(sigma)
    else:
        sigma = jax.nn.relu(sigma)

    rgb = rgb.reshape(B, N, 3)
    sigma = sigma.reshape(B, N)

    return volume_render_rays(
        rgb.astype(jnp.float32), sigma.astype(jnp.float32), z_vals,
        ray_norm=ray_norms, white_bkgd=white_bkgd,
        infinite_last_bin=infinite_last_bin)
