"""Sinusoidal positional encoding as a pure function.

Parity target: ``nerf_sandbox/source/models/encoders.py:6-123``
(``PositionalEncoder``): gamma(x) = [x?, sin(f_k x), cos(f_k x)] with
log- or linear-spaced frequency bands over ``2^[min_freq_log2, max_freq_log2]``
and an optional 2*pi factor.  Feature ordering matches the reference exactly:
all sin features for every band come first, then all cos features
(``torch.cat([sin, cos], dim=-2).reshape(..., -1)`` — encoders.py:95-101),
i.e. layout ``[x?, sin(f0 x0..2), sin(f1 x0..2), ..., cos(f0 x0..2), ...]``.

TPU notes: the encoding is a tiny VPU-bound op; under jit XLA fuses it into
the consumer matmul's producer (the Pallas path in ``ops/fused_mlp.py``
consumes the already-encoded features).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def make_frequency_bands(num_freqs: int, *, log_spaced: bool = True,
                         min_freq_log2: int | None = None,
                         max_freq_log2: int | None = None,
                         use_two_pi: bool = False) -> np.ndarray:
    """Frequency bands, matching encoders.py:54-66 (+ 2*pi factor :91-92)."""
    if min_freq_log2 is None:
        min_freq_log2 = 0
    if max_freq_log2 is None:
        max_freq_log2 = num_freqs - 1
    if log_spaced:
        bands = 2.0 ** np.linspace(float(min_freq_log2), float(max_freq_log2),
                                   num=num_freqs, dtype=np.float64)
    else:
        bands = np.linspace(2.0 ** float(min_freq_log2),
                            2.0 ** float(max_freq_log2),
                            num=num_freqs, dtype=np.float64)
    if use_two_pi:
        bands = bands * (2.0 * np.pi)
    return bands.astype(np.float32)


def encoder_out_dim(input_dims: int, num_freqs: int,
                    include_input: bool = True) -> int:
    """out_dim = D·include_input + D·2F (encoders.py:71)."""
    return (input_dims if include_input else 0) + input_dims * num_freqs * 2


def positional_encoding(x: jnp.ndarray, freq_bands: jnp.ndarray,
                        include_input: bool = True,
                        band_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply gamma(x). ``x``: (..., D); ``freq_bands``: (F,). Returns (..., out_dim).

    Feature layout matches encoders.py:95-104: per-band sin blocks then
    per-band cos blocks, input prepended when ``include_input``.

    ``band_weights`` (F,), optional: per-band feature scaling — the BARF
    coarse-to-fine anneal (``barf_band_weights``). None == all-ones.
    """
    fb = freq_bands.astype(x.dtype)
    xb = x[..., None, :] * fb[:, None]              # (..., F, D)
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    if band_weights is not None:
        w = band_weights.astype(x.dtype)[:, None]   # (F, 1)
        sin = sin * w
        cos = cos * w
    enc = jnp.concatenate([sin, cos], axis=-2)       # (..., 2F, D)
    enc = enc.reshape(*x.shape[:-1], -1)             # (..., 2F*D)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def barf_band_weights(step, anneal_steps: int, num_bands: int) -> jnp.ndarray:
    """BARF coarse-to-fine schedule (Lin et al. 2021, eq. 13) → (F,).

    alpha = F·step/anneal ramps 0→F; band k's weight is 0 before alpha
    reaches k, a smooth cosine ease-in while alpha crosses [k, k+1], and 1
    after. Low bands activate first, so early pose gradients follow the
    smooth coarse signal instead of the oscillatory high frequencies —
    the fix that makes --pose_opt converge from bad initial poses.
    ``step`` may be traced (no recompile per step).
    """
    alpha = num_bands * jnp.asarray(step, jnp.float32) / float(anneal_steps)
    k = jnp.arange(num_bands, dtype=jnp.float32)
    t = jnp.clip(alpha - k, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * t))


def sh_encoding(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical-harmonics basis at unit directions → (..., degree²).

    The Instant-NGP/tiny-cuda-nn view-direction encoder (beyond-reference;
    the torch reference has only the frequency encoder, encoders.py:6-106):
    degree d emits the d² real SH basis values Y_l^m, l<d — a smooth
    orthonormal basis on S² that is both smaller (16 vs 27 dims at the
    vanilla L=4) and cheaper than sin/cos of 2^k·d. Pure polynomial in
    (x,y,z) — elementwise VPU work that XLA fuses into the surrounding
    matmuls; the fused Pallas eval kernel consumes it unchanged (enc_dir
    is precomputed outside the kernel). Tested against Monte-Carlo
    orthonormality on the sphere.
    """
    assert 1 <= degree <= 4, "sh_encoding supports degree 1..4"
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree > 1:
        out += [-0.48860251190291987 * y,
                0.48860251190291987 * z,
                -0.48860251190291987 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        out += [1.0925484305920792 * x * y,
                -1.0925484305920792 * y * z,
                0.94617469575755997 * zz - 0.31539156525251999,
                -1.0925484305920792 * x * z,
                0.54627421529603959 * (xx - yy)]
    if degree > 3:
        out += [0.59004358992664352 * y * (-3.0 * xx + yy),
                2.8906114426405538 * x * y * z,
                0.45704579946446572 * y * (1.0 - 5.0 * zz),
                0.3731763325901154 * z * (5.0 * zz - 3.0),
                0.45704579946446572 * x * (1.0 - 5.0 * zz),
                1.4453057213202769 * z * (xx - yy),
                0.59004358992664352 * x * (-xx + 3.0 * yy)]
    return jnp.stack(out, axis=-1)


def encode_dirs(vdirs: jnp.ndarray, dir_bands: jnp.ndarray,
                include_input: bool = True, dir_encoder: str = "freq",
                sh_degree: int = 4) -> jnp.ndarray:
    """View-direction encoder switch: reference freq gamma (default) or
    spherical harmonics. One choke point for every dir encode in the
    framework (train forward, eval renderer, occupancy probe forward)."""
    if dir_encoder == "sh":
        return sh_encoding(vdirs, degree=sh_degree)
    return positional_encoding(vdirs, dir_bands, include_input=include_input)


def vanilla_encoders():
    """(pos_bands, dir_bands) for official NeRF defaults (encoders.py:108-123).

    Positions: L=10 → 63 out dims. Viewdirs: L=4 → 27 out dims.
    """
    pos = make_frequency_bands(10)
    dirs = make_frequency_bands(4)
    return pos, dirs


def z_to_intervals(z: jnp.ndarray):
    """Per-sample integration intervals from sorted sample positions.

    ``z``: (..., N) sorted. Returns (lower, upper), each (..., N): interior
    edges are the midpoints between neighbours (the same partition the
    stratified jitter and the integrator's deltas use); the first/last
    edges extend symmetrically so every sample sits at (approximately) its
    interval's centre. This adapts mip-NeRF's edge-based frustum casting
    to this framework's point-sample contract (N samples, not N+1 edges).
    """
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    lower = jnp.concatenate([2.0 * z[..., :1] - mids[..., :1], mids], axis=-1)
    upper = jnp.concatenate([mids, 2.0 * z[..., -1:] - mids[..., -1:]], axis=-1)
    return lower, upper


def conical_frustum_moments(t0: jnp.ndarray, t1: jnp.ndarray,
                            base_radius: jnp.ndarray):
    """Gaussian moments of a conical frustum (mip-NeRF, Barron et al. 2021,
    eq. 7 — the numerically 'stable' parameterization from the paper).

    The frustum spans ray distances [t0, t1] on a cone whose cross-section
    radius grows as ``base_radius * t``. Returns (t_mean, t_var, r_var):
    the mean/variance of the distance along the ray axis and the variance
    perpendicular to it, of a uniform distribution over the frustum volume.
    Shapes broadcast; ``base_radius`` is typically (..., 1) per ray.
    """
    mu = (t0 + t1) / 2.0
    hw = (t1 - t0) / 2.0
    denom = 3.0 * mu ** 2 + hw ** 2
    t_mean = mu + (2.0 * mu * hw ** 2) / denom
    t_var = hw ** 2 / 3.0 - (4.0 / 15.0) * (
        (hw ** 4 * (12.0 * mu ** 2 - hw ** 2)) / denom ** 2)
    r_var = base_radius ** 2 * (
        mu ** 2 / 4.0 + (5.0 / 12.0) * hw ** 2
        - (4.0 / 15.0) * hw ** 4 / denom)
    return t_mean, t_var, r_var


def lift_gaussian_diag(d_unit: jnp.ndarray, t_mean: jnp.ndarray,
                       t_var: jnp.ndarray, r_var: jnp.ndarray,
                       rays_o: jnp.ndarray):
    """Lift per-frustum axial/radial moments to world-space diagonal
    Gaussians (mip-NeRF ``lift_gaussian``, diagonal covariance).

    ``d_unit``/``rays_o``: (B, 3) unit directions and origins; ``t_mean``/
    ``t_var``/``r_var``: (B, N). Returns (mean (B,N,3), var_diag (B,N,3)).
    """
    mean = rays_o[..., None, :] + d_unit[..., None, :] * t_mean[..., None]
    d2 = d_unit ** 2                                   # (B, 3); sum = 1
    var = (t_var[..., None] * d2[..., None, :]
           + r_var[..., None] * (1.0 - d2[..., None, :]))
    return mean, var


def integrated_positional_encoding(mean: jnp.ndarray, var_diag: jnp.ndarray,
                                   freq_bands: jnp.ndarray,
                                   include_input: bool = True) -> jnp.ndarray:
    """IPE (mip-NeRF eq. 14): the expected positional encoding of a
    diagonal Gaussian, E[sin(f x)] = sin(f mu) * exp(-f^2 sigma^2 / 2).

    Feature layout matches :func:`positional_encoding` exactly (per-band
    sin blocks then cos blocks, mean prepended when ``include_input``), so
    the same MLP consumes either — IPE with ``var_diag = 0`` reduces
    bitwise to the point encoding. High frequencies attenuate smoothly to
    zero as the Gaussian's footprint exceeds their period: the encoder
    itself becomes scale-aware (anti-aliasing), which a point-sampled
    encoding cannot express.
    """
    fb = freq_bands.astype(mean.dtype)
    xb = mean[..., None, :] * fb[:, None]                    # (..., F, D)
    att = jnp.exp(-0.5 * var_diag[..., None, :] * (fb ** 2)[:, None])
    sin = jnp.sin(xb) * att
    cos = jnp.cos(xb) * att
    enc = jnp.concatenate([sin, cos], axis=-2)               # (..., 2F, D)
    enc = enc.reshape(*mean.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([mean, enc], axis=-1)
    return enc


def contract_gaussian(mean: jnp.ndarray, d_unit: jnp.ndarray,
                      t_var: jnp.ndarray, r_var: jnp.ndarray):
    """Push a conical-frustum Gaussian through the scene contraction
    (mip-NeRF 360 §3.3: the linearized warp f(mu) + J_f(mu)·(x-mu)),
    keeping the covariance's RANK-ONE STRUCTURE exact.

    The frustum Gaussian's covariance is Σ = t_var·ddᵀ + r_var·(I − ddᵀ)
    (axial/radial, NOT world-axis-diagonal). The IPE needs
    diag(J Σ Jᵀ) = t_var·(Jd)² + r_var·(rowsum(J∘J) − (Jd)²), which this
    computes exactly under the linearization. Diagonalizing Σ in world
    axes FIRST and then applying J∘J elementwise (the naive composition of
    ``lift_gaussian_diag`` with a diagonal pushforward) drops the J_ij Σ_jk
    J_ik cross terms; for a far radial background point that inflates the
    contracted axial variance from the true O(Δt/r²) to O(Δt/r) — ~r× too
    wide — so every band's IPE attenuation collapses to zero exactly where
    contraction is supposed to preserve disparity-scaled detail (measured:
    the round-4 contracted-IPE quality regressions, RESULTS.md "Integrated
    positional encoding").

    ``mean``: (B, N, 3) world-space frustum means; ``d_unit``: (B, 3) unit
    ray directions; ``t_var``/``r_var``: (B, N). J is the contraction's
    analytic Jacobian via ``jacfwd`` (branchless; 3 JVPs of VPU work per
    point). Returns (contracted mean (B,N,3), var_diag (B,N,3)).
    """
    shape = mean.shape
    m = mean.reshape(-1, 3)
    d = jnp.broadcast_to(d_unit[..., None, :], shape).reshape(-1, 3)
    J = jax.vmap(jax.jacfwd(scene_contract))(m)              # (Q, 3, 3)
    Jd = jnp.einsum("qij,qj->qi", J, d)                      # (Q, 3)
    row2 = jnp.sum(J * J, axis=-1)                           # (Q, 3)
    tv = t_var.reshape(-1, 1)
    rv = r_var.reshape(-1, 1)
    # diag(J(I−ddᵀ)Jᵀ) = rowsum(J²) − (Jd)² ≥ 0; clamp the float dust
    new_v = tv * Jd ** 2 + rv * jnp.maximum(row2 - Jd ** 2, 0.0)
    return scene_contract(m).reshape(shape), new_v.reshape(shape)


def pixel_cone_radii(fx, d_norm: jnp.ndarray) -> jnp.ndarray:
    """Per-ray base radius of the pixel's viewing cone, in UNIT-direction
    parameterization: r(t_metric) = radii * t_metric.

    mip-NeRF computes radii as 2/sqrt(12) x the x-neighbour direction
    difference of UNNORMALIZED dirs (||∂d/∂x|| = 1/fx for a pinhole —
    rotation preserves it); dividing by ||d|| converts to the metric
    (unit-direction) parameterization this framework marches in.
    ``d_norm``: (..., 1) or (...,) pre-normalization direction norms.
    """
    r = (2.0 / jnp.sqrt(12.0)) / fx
    return r / jnp.maximum(d_norm, 1e-9)


def scene_contract(x: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """mip-NeRF 360 scene contraction (Barron et al. 2022, eq. 10).

    contract(x) = x                         for ||x|| <= 1
                = (2 - 1/||x||) * x/||x||   otherwise

    Maps all of R^3 into the radius-2 ball: the unit ball is preserved,
    everything beyond it lands in the [1, 2) shell with resolution
    proportional to disparity. Applied to sample positions before the
    positional/grid encoding (``--scene_contraction``) so unbounded scenes
    keep bounded, well-scaled encoder inputs. Beyond-reference: the
    reference handles unbounded forward-facing scenes only via the NDC
    warp (ray_utils.py:92-126); contraction is the 360°/background
    counterpart. Branchless (jnp.where) for jit.
    """
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    n = jnp.maximum(n, eps)
    return jnp.where(n <= 1.0, x, (2.0 - 1.0 / n) * (x / n))


def scene_uncontract(c: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Inverse of :func:`scene_contract` on the open radius-2 ball.

    uncontract(c) = c                        for ||c|| <= 1
                  = c/(||c||·(2 - ||c||))    otherwise  (||c|| < 2)

    Used by the CONTRACTED occupancy grid (models/occupancy.py): cells
    tile contracted [-2,2]³ space, so updating a cell needs the world
    point whose contraction is the cell center. Inputs at ``||c|| >= 2``
    (corner cells of the cube outside the ball) are clamped just inside
    the shell — they map to "very far" world points, which is the right
    semantic for marking sky-distance content.
    """
    n = jnp.linalg.norm(c, axis=-1, keepdims=True)
    n = jnp.maximum(n, eps)
    n_c = jnp.minimum(n, 2.0 - eps)
    r = 1.0 / (2.0 - n_c)                    # world radius for ||c|| > 1
    return jnp.where(n <= 1.0, c, (c / n) * r)
