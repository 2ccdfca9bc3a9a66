"""Volume rendering (alpha compositing) over per-ray samples.

Parity target: ``nerf_sandbox/source/utils/render_utils.py:108-167``
(``volume_render_rays``):

* deltas = diff(z) with last bin 1e10 (``infinite_last_bin``) or 0
* deltas scaled by ``||d_raw||`` to metric step lengths
* alpha = 1 - exp(-clamp(sigma*delta, 0, 60))
* transmittance = EXCLUSIVE cumprod of (1 - alpha + eps), eps = 1e-10
* weights = T * alpha (nan-guarded); acc = clamp(sum w, 0, 1)
* depth = sum(w * z) / (acc + eps)
* composite = sum(w * rgb) (+ (1-acc) white background), clamped to [0,1]

TPU notes: the cumprod runs along the per-ray sample axis (length <= 192) —
XLA lowers it to a log-depth scan that fuses with the surrounding
elementwise ops; the fused Pallas MLP path (``ops/fused_mlp.py``) leaves
this composite to XLA after the MLP tile.
"""

from __future__ import annotations

import jax.numpy as jnp


def exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """cumprod shifted right with a leading 1 (render_utils.py:147-150)."""
    moved = jnp.moveaxis(x, axis, -1)
    ones = jnp.ones_like(moved[..., :1])
    shifted = jnp.concatenate([ones, moved], axis=-1)
    out = jnp.cumprod(shifted, axis=-1)[..., :-1]
    return jnp.moveaxis(out, -1, axis)


def volume_render_rays(
    rgb: jnp.ndarray,                  # (B, N, 3) — post-sigmoid
    sigma: jnp.ndarray,                # (B, N)    — post-activation
    z_depths: jnp.ndarray,             # (B, N)    — sorted
    ray_norm: jnp.ndarray | None = None,   # (B,) or (B,1): ||d_raw||
    *,
    white_bkgd: bool = False,
    eps: float = 1e-10,
    infinite_last_bin: bool = False,
):
    """Alpha-composite along each ray.

    Returns (composite_rgb (B,3), weights (B,N), acc (B,1), depth (B,1));
    depth stays in z units (render_utils.py:124, 157).
    """
    deltas_finite = z_depths[..., 1:] - z_depths[..., :-1]
    if infinite_last_bin:
        delta_last = jnp.full_like(deltas_finite[..., :1], 1e10)
    else:
        delta_last = jnp.zeros_like(deltas_finite[..., :1])
    deltas = jnp.concatenate([deltas_finite, delta_last], axis=-1)   # (B, N)

    if ray_norm is not None:
        rn = ray_norm.reshape(ray_norm.shape[0], 1).astype(deltas.dtype)
        deltas = deltas * rn

    sdt = jnp.clip(sigma * deltas, 0.0, 60.0)
    alphas = 1.0 - jnp.exp(-sdt)

    transmittance = exclusive_cumprod(1.0 - alphas + eps, axis=-1)
    weights = transmittance * alphas
    weights = jnp.nan_to_num(weights, nan=0.0, posinf=0.0, neginf=0.0)

    acc = jnp.clip(jnp.sum(weights, axis=-1, keepdims=True), 0.0, 1.0)
    depth = jnp.sum(weights * z_depths, axis=-1, keepdims=True) / (acc + eps)

    composite = jnp.sum(weights[..., None] * rgb, axis=-2)
    if white_bkgd:
        composite = composite + (1.0 - acc)
    composite = jnp.clip(
        jnp.nan_to_num(composite, nan=0.0, posinf=1.0, neginf=0.0), 0.0, 1.0)

    return composite, weights, acc, depth
