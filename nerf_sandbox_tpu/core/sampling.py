"""Ray-sample generation: stratified coarse samples + inverse-CDF fine samples.

Parity targets:

* coarse stratified sampling with per-bin jitter —
  ``nerf_sandbox/source/train/trainer.py:901-908`` (train) and
  ``source/utils/render_utils.py:330-358`` (eval, optional perturb)
* hierarchical inverse-CDF sampling —
  ``nerf_sandbox/source/utils/sampling_utils.py:6-64`` (``sample_pdf``):
  accepts bin edges (M+1) or midpoints (M, expanded to edges), +1e-5 weight
  floor before normalisation, CDF with zero prefix, ``searchsorted`` with
  ``right=True`` semantics, lo/hi gather, linear interpolation with the
  ``denom < 1e-5 → 1`` guard.

TPU-first design: everything is a fixed-shape pure function of (rng, arrays);
random draws are threaded JAX PRNG keys rather than global state.  The
jitter never needs a sort — the stratified bins are disjoint, so the
jittered samples are monotone by construction (the reference sorts a
provably-sorted array; see trainer.py:908).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_samples(near, far, n_samples: int, dtype=jnp.float32,
                       lindisp: bool = False) -> jnp.ndarray:
    """Uniform z template over [near, far], shape (n_samples,).

    Matches ``near*(1-t) + far*t`` with t = linspace(0,1,n) (trainer.py:901-902).
    ``lindisp`` spaces samples uniformly in DISPARITY instead —
    z = 1/lerp(1/near, 1/far, t) (the bmild nerf-pytorch ``lindisp`` knob;
    the reference hard-codes False, compare_nerf_repos.py:756). Requires
    near > 0; concentrates samples toward the camera for unbounded depth
    ranges (pairs with --scene_contraction).
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    if lindisp:
        return 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    return near * (1.0 - t) + far * t


def perturb_z_samples(key: jax.Array, z: jnp.ndarray) -> jnp.ndarray:
    """Jitter each sample uniformly within its stratified bin.

    ``z``: (..., N) sorted. Bins are [z_0, m_0], [m_0, m_1], ..., [m_{N-2}, z_{N-1}]
    with m_i the midpoints — exactly trainer.py:904-907. Result is monotone,
    so no re-sort is required (the reference's ``torch.sort`` is a no-op).
    """
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    lower = jnp.concatenate([z[..., :1], mids], axis=-1)
    upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
    u = jax.random.uniform(key, z.shape, dtype=z.dtype)
    return lower + (upper - lower) * u


def _mids_to_edges(mids: jnp.ndarray) -> jnp.ndarray:
    """Expand M midpoints to M+1 edges (sampling_utils.py:24-33)."""
    M = mids.shape[-1]
    if M == 1:
        d = jnp.full_like(mids, 1e-3)
        return jnp.concatenate([mids - 0.5 * d, mids + 0.5 * d], axis=-1)
    lo = mids[..., :1] - 0.5 * (mids[..., 1:2] - mids[..., :1])
    hi = mids[..., -1:] + 0.5 * (mids[..., -1:] - mids[..., -2:-1])
    inter = 0.5 * (mids[..., 1:] + mids[..., :-1])
    return jnp.concatenate([lo, inter, hi], axis=-1)


def sample_pdf(
    bins: jnp.ndarray,          # (B, M) midpoints OR (B, M+1) edges
    weights: jnp.ndarray,       # (B, M)
    n_samples: int,
    *,
    key: jax.Array | None = None,
    deterministic: bool = False,
    u: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Hierarchical sampling from a piecewise-constant PDF → (B, n_samples).

    Numerics match sampling_utils.py:6-64.  ``u`` may be supplied explicitly
    (used by parity tests); otherwise deterministic → inclusive linspace(0,1),
    stochastic → uniform draws from ``key``.
    """
    B, M = weights.shape
    if bins.shape[-1] == M + 1:
        edges = bins
    elif bins.shape[-1] == M:
        edges = _mids_to_edges(bins)
    else:
        raise ValueError(f"Incompatible shapes: bins={bins.shape}, weights={weights.shape}")

    w = jnp.maximum(weights + 1e-5, 0.0)
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)                                   # (B, M)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (B, M+1)

    if u is None:
        if deterministic:
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype), (B, n_samples))
        else:
            if key is None:
                raise ValueError("sample_pdf: key required when not deterministic")
            u = jax.random.uniform(key, (B, n_samples), dtype=cdf.dtype)

    # searchsorted(cdf, u, right=True) as a dense comparison count — M+1
    # comparisons per query on the VPU, no sequential scan.
    inds = jnp.sum((cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32),
                   axis=-1)                                       # (B, S)
    below = jnp.clip(inds - 1, 0, M)
    above = jnp.clip(inds, 1, M)

    # TPU note: per-row dynamic gathers (take_along_axis) lower to a slow
    # serialized gather (~2 ms each at B=1024 on v5e).  Express the four
    # lookups as two one-hot contractions instead — pure VPU/MXU work that
    # XLA fuses with the comparison above (measured ~100x faster).
    vals = jnp.stack([cdf, edges], axis=-1)                       # (B, M+1, 2)
    oh_lo = jax.nn.one_hot(below, M + 1, dtype=vals.dtype)        # (B, S, M+1)
    oh_hi = jax.nn.one_hot(above, M + 1, dtype=vals.dtype)
    # HIGHEST: bf16 (the TPU default) would quantize the CDF (~4e-3) and
    # the z edges (~1.6e-2 near z=4), corrupting fine-sample placement.
    hp = jax.lax.Precision.HIGHEST
    lo = jnp.einsum("bsm,bmk->bsk", oh_lo, vals, precision=hp)
    hi = jnp.einsum("bsm,bmk->bsk", oh_hi, vals, precision=hp)
    cdf_lo, bin_lo = lo[..., 0], lo[..., 1]
    cdf_hi, bin_hi = hi[..., 0], hi[..., 1]

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_lo) / denom
    return bin_lo + t * (bin_hi - bin_lo)


def merge_z_samples(z_coarse: jnp.ndarray, z_fine: jnp.ndarray) -> jnp.ndarray:
    """Sorted union of coarse+fine samples (trainer.py:981)."""
    return jnp.sort(jnp.concatenate([z_coarse, z_fine], axis=-1), axis=-1)


def resample_midpoints(z: jnp.ndarray, w: jnp.ndarray, n: int, *,
                       key=None, deterministic: bool = False,
                       stop_grad: bool = True, power=None,
                       explore_floor: float = 0.0) -> jnp.ndarray:
    """Fine z's from a coarse pass's per-sample weights — the caller-side
    convention around ``sample_pdf`` (trainer.py:926-934): bins are the z
    midpoints, bin weights the averaged interval weights, detached, +1e-5
    floor.  One place for the convention (used by the hierarchical train
    step, proposal mode, eval renderer, and diagnostics).

    ``power`` (None = off): raise the padded bin weights to this exponent
    before the inverse-CDF draw — the mip-NeRF 360 proposal *anneal*
    (w^anneal with anneal ramping 0→1 flattens early resampling toward
    uniform so the untrained proposal cannot starve scene regions of main
    samples). May be a traced scalar; power=1 is bit-identical to off.

    ``explore_floor`` (0 = off): blend the per-ray normalized PDF with a
    uniform floor, (1-f)·ŵ + f/M — a PERSISTENT fraction of the draws
    always covers the whole range (occupancy's ``explore_frac`` analogue
    for proposal resampling; keeps grid encoders receiving gradient
    outside the proposal's current peaks)."""
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    wb = 0.5 * (w[..., 1:] + w[..., :-1])
    if stop_grad:
        wb = jax.lax.stop_gradient(wb)
    wb = wb + 1e-5
    if power is not None:
        wb = wb ** power
    if explore_floor and explore_floor > 0.0:
        wb_hat = wb / jnp.sum(wb, axis=-1, keepdims=True)
        wb = (1.0 - explore_floor) * wb_hat + explore_floor / wb.shape[-1]
    return sample_pdf(mids, wb, n, key=key,
                      deterministic=deterministic)


def distortion_loss(z: jnp.ndarray, w: jnp.ndarray, near, far,
                    lindisp: bool = False) -> jnp.ndarray:
    """Distortion loss of mip-NeRF 360 (Barron et al. 2022 §4, L_dist).

    Penalizes each ray's weight histogram for being SPREAD OUT — the
    regularizer that kills the near-camera floaters / fog an unbounded
    scene otherwise trains into (every background pixel can be explained
    by a semi-transparent smear in front of the camera; measured on
    tests/make_360_scene.py, RESULTS.md "Unbounded-360").

        L = Σ_ij w_i w_j |u_i − u_j|  +  (1/3) Σ_i w_i² Δ_i

    computed in NORMALIZED s-space — the sampler's own spacing (linear in
    z, or linear in disparity under ``lindisp``) mapped to [0, 1] — so a
    histogram occupying one coarse bin costs the same anywhere on the ray.
    ``z`` (B, N) sorted sample positions in marching space, ``w`` (B, N)
    their integrator weights (grad flows into w; z's are already
    stop-gradiented by the resampling convention).

    O(N) via prefix sums over the sorted samples (the pairwise form is
    O(N²·B) HBM traffic for no reason):
        Σ_ij w_i w_j |u_i − u_j| = 2 Σ_i w_i (u_i W_{<i} − S_{<i}).

    Beyond-reference: the torch reference has no unbounded-scene
    machinery (no analogue file).
    """
    if lindisp:
        g, gn, gf = 1.0 / jnp.maximum(z, 1e-9), 1.0 / near, 1.0 / far
    else:
        g, gn, gf = z, near, far
    s = (g - gn) / (gf - gn)                                   # (B, N) in [0,1]
    mids = 0.5 * (s[..., 1:] + s[..., :-1])
    e = jnp.concatenate([s[..., :1], mids, s[..., -1:]], axis=-1)  # (B, N+1)
    u = 0.5 * (e[..., 1:] + e[..., :-1])                       # interval mids
    delta = e[..., 1:] - e[..., :-1]                           # interval sizes

    w_cum = jnp.cumsum(w, axis=-1) - w                         # W_{<i}
    wu_cum = jnp.cumsum(w * u, axis=-1) - w * u                # S_{<i}
    inter = 2.0 * jnp.sum(w * (u * w_cum - wu_cum), axis=-1)
    intra = jnp.sum(w * w * delta, axis=-1) / 3.0
    return jnp.mean(inter + intra)


def interlevel_loss(z_main: jnp.ndarray, w_main: jnp.ndarray,
                    z_prop: jnp.ndarray, w_prop: jnp.ndarray) -> jnp.ndarray:
    """Proposal (interlevel) loss of mip-NeRF 360 (Barron et al. 2022 §3).

    Treats consecutive samples as interval partitions: main intervals
    ``[z_main_i, z_main_{i+1})`` carry mass ``w_main_i`` and proposal
    intervals ``[z_prop_j, z_prop_{j+1})`` carry mass ``w_prop_j`` (the
    last sample of each level — the infinite bin — is dropped).  For every
    main interval the proposal's achievable mass is upper-bounded by the
    sum of ALL overlapping proposal-interval weights; the loss penalises
    the proposal wherever the main histogram exceeds that bound:

        bound_i = sum_j w_prop_j * 1[z_prop_j < z_main_{i+1}
                                     and z_prop_{j+1} > z_main_i]
        L = mean_rays sum_i max(0, w_main_i - bound_i)^2 / (w_main_i + eps)

    (the mip-NeRF 360 ``lossfun_outer`` normalisation — dividing by the
    MAIN weight keeps each term <= w_main_i <= 1; dividing by the bound
    would explode wherever the untrained proposal has ~zero mass)

    ``w_main`` must be stop-gradiented by the caller — the gradient flows
    to the PROPOSAL through the bound (the main model is never distilled
    toward the proposal).  Beyond-reference: the reference's hierarchical
    sampler has no proposal network.

    No gathers/sorting: the overlap test is a broadcast comparison
    (B, Nm-1, Np-1) contracted against w_prop on the MXU — TPU-friendly
    like sample_pdf's one-hot formulation.
    """
    m0, m1 = z_main[..., :-1], z_main[..., 1:]        # (B, Nm-1)
    p0, p1 = z_prop[..., :-1], z_prop[..., 1:]        # (B, Np-1)
    wm = w_main[..., :-1]                             # mass of finite bins
    wp = w_prop[..., :-1]
    overlap = ((p0[..., None, :] < m1[..., :, None])
               & (p1[..., None, :] > m0[..., :, None]))  # (B, Nm-1, Np-1)
    # HIGHEST like every weight-processing einsum here: the TPU's bf16
    # default would put ~0.5% noise in the bound — spurious hinge excess
    # exactly where the proposal is nearly converged (wm ≈ bound).
    bound = jnp.einsum("bmp,bp->bm", overlap.astype(wp.dtype), wp,
                       precision=jax.lax.Precision.HIGHEST)
    excess = jnp.maximum(wm - bound, 0.0)
    return jnp.mean(jnp.sum(excess ** 2 / (wm + 1e-7), axis=-1))
