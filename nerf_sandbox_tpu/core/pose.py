"""SE(3) pose-delta helpers for learned camera refinement (--pose_opt).

Beyond-reference capability (BARF, Lin et al. 2021 / NeRF--, Wang et al.
2021): each training frame carries a learnable 6-vector ``[w | dt]``
(axis-angle rotation + translation) applied as a LEFT world-frame rigid
composition onto its camera-to-world pose:

    c2w' = [exp([w]x) @ R  |  exp([w]x) @ t + dt]

Zero delta is exactly the identity, so ``--pose_opt`` with an untouched
table reproduces baseline rays bit-for-bit (pinned in tests). Gradients
flow from the photometric loss through ray generation (core/rays.py is
differentiable in K and c2w) into the delta table.

All ops are jnp and batched over leading dims; ``so3_exp`` uses the
Taylor-guarded Rodrigues form so gradients at ||w|| -> 0 are exact, not
NaN (the common sin(x)/x autodiff trap).
"""

from __future__ import annotations

import jax.numpy as jnp


def _hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle → (..., 3, 3) skew-symmetric [w]x."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([zero, -wz, wy], axis=-1),
        jnp.stack([wz, zero, -wx], axis=-1),
        jnp.stack([-wy, wx, zero], axis=-1),
    ], axis=-2)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) → (..., 3, 3) rotation matrices.

    R = I + sinc(θ)·[w]x + ((1-cosθ)/θ²)·[w]x² with both coefficient
    functions branch-free Taylor-guarded below θ² = 1e-8 so the exp map
    and its gradient are exact at zero (init state of the delta table).
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    K = _hat(w)
    K2 = K @ K
    small = theta2 < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))   # guarded sqrt grad
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * K2


def apply_pose_delta(c2w: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Left-compose per-pose rigid deltas: (..., 3, 4), (..., 6) → (..., 3, 4)."""
    R_d = so3_exp(delta[..., :3])
    R = R_d @ c2w[..., :3, :3]
    t = (R_d @ c2w[..., :3, 3:])[..., 0] + delta[..., 3:]
    return jnp.concatenate([R, t[..., None]], axis=-1)


def apply_cam_delta(c2w: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Camera-CENTERED pose perturbation: rotate the orientation in place
    and translate the camera center: ``[exp([w]x) @ R | t + dt]``.

    Same (..., 3, 4) × (..., 6) → (..., 3, 4) contract as
    ``apply_pose_delta`` but a different chart. The world-frame left
    composition above rotates the camera position about the WORLD origin,
    so correcting a pure orientation error of angle θ needs a
    compensating translation of ‖t‖·θ — for a camera 4 units out, a 3°
    error needs ‖dt‖ ≈ 0.2, far outside the "delta is small" regime, and
    the photometric rotate↔translate gauge valley is maximally coupled in
    that chart. In THIS chart orientation and position decouple: a small
    orientation jitter is a small ``w`` with dt ≈ 0, which is what
    test-time refinement (render/pose_refine.py) descends — measured on
    the sphere-scene recovery test, the world-frame chart diverges
    (pose moves 2.5-7× further from truth while the loss drops) and this
    chart recovers at both 3° and 5° jitter. Training-time --pose_opt
    keeps the world-frame chart (it co-trains with the field, so gauge
    is free and parity with BARF's parameterization matters there).
    """
    R = so3_exp(delta[..., :3]) @ c2w[..., :3, :3]
    t = c2w[..., :3, 3] + delta[..., 3:]
    return jnp.concatenate([R, t[..., None]], axis=-1)
