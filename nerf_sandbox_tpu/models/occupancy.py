"""Occupancy-grid accelerated sampling (NerfAcc-style, TPU-static shapes).

Beyond-reference acceleration (PAPERS.md: "NerfAcc: Efficient Sampling
Accelerates NeRFs"): an EMA density grid replaces the coarse NeRF pass.
Instead of evaluating a full 8x256 coarse MLP at 64 samples/ray to find
where matter lives, each ray probes the grid at ``n_probes`` equidistant
points (a flat VMEM gather — measured ~free on v5e) and places ALL of its
MLP samples by inverse-CDF sampling from the probed density profile.

TPU-static design (no dynamic shapes, unlike CUDA NerfAcc):

* samples are REDISTRIBUTED, never skipped — every ray keeps a fixed
  sample count, so one compiled program serves the whole run
* the grid is training STATE, not a parameter: updated every
  ``update_every`` steps by querying the fine model's density at jittered
  cell centers and taking ``max(grid * decay, sigma)`` (the Instant-NGP
  EMA rule); it is checkpointed alongside the params (train/checkpoints.py
  ``extra`` slot) so resume is bit-exact
* an ``explore_frac`` floor keeps a fraction of probability mass uniform
  so unoccupied space keeps receiving samples (the grid can recover from
  false negatives).

Used by ``--sampling occupancy``: drops the coarse MLP entirely — the
training step becomes ONE model evaluation at ``nf`` samples/ray.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class OccupancyConfig(NamedTuple):
    resolution: int = 64
    lo: Tuple[float, float, float] = (-1.5, -1.5, -1.5)
    hi: Tuple[float, float, float] = (1.5, 1.5, 1.5)
    decay: float = 0.95
    update_every: int = 16
    n_probes: int = 64
    explore_frac: float = 0.02    # uniform mass floor for exploration
    alpha_thr: float = 0.01       # cell counts as occupied when its alpha
                                  # over one probe bin exceeds this
    # Disparity-spaced probe bins (matches --lindisp sample spacing).
    # With a linear partition of an unbounded [near, far] the whole
    # foreground falls inside a handful of probe bins (measured: 4 of 64
    # on the normalized 360 scene → occupancy plateaus ~8 dB below
    # proposal; RESULTS.md "Unbounded-360"). Requires near > 0.
    lindisp: bool = False
    # Grid tiles CONTRACTED space (NerfAcc-360 practice): cells cover the
    # mip-NeRF 360 radius-2 ball (set lo/hi to ±2), so a finite grid holds
    # occupancy for an UNBOUNDED scene — lookups contract the query point,
    # updates un-contract the cell center (core/encoding.py). The trainer
    # enables this automatically under --sampling occupancy
    # --scene_contraction true.
    contracted: bool = False


def init_occupancy_grid(cfg: OccupancyConfig) -> jnp.ndarray:
    """Uniform (all-occupied) grid → initial sampling matches stratified."""
    return jnp.ones((cfg.resolution ** 3,), jnp.float32)


def grid_values(grid: jnp.ndarray, cfg: OccupancyConfig,
                pts: jnp.ndarray) -> jnp.ndarray:
    """Nearest-cell density lookup for world/marching points (..., 3).

    Out-of-box points return 0 (no mass placed outside the volume).
    ``cfg.contracted``: the box lives in contracted space — queries are
    contracted first (every finite world point then lands inside a ±2
    box, so nothing is ever out-of-box).
    """
    R = cfg.resolution
    lo = jnp.asarray(cfg.lo, jnp.float32)
    hi = jnp.asarray(cfg.hi, jnp.float32)
    if cfg.contracted:
        from nerf_sandbox_tpu.core.encoding import scene_contract
        pts = scene_contract(pts)
    u = (pts - lo) / (hi - lo)                       # [0,1] inside the box
    inside = jnp.all((u >= 0.0) & (u <= 1.0), axis=-1)
    cell = jnp.clip((u * R).astype(jnp.int32), 0, R - 1)
    flat = (cell[..., 0] * R + cell[..., 1]) * R + cell[..., 2]
    vals = grid[flat.reshape(-1)].reshape(flat.shape)
    return jnp.where(inside, vals, 0.0)


def ray_probe_weights(grid: jnp.ndarray, cfg: OccupancyConfig,
                      rays_o: jnp.ndarray, rays_d_unit: jnp.ndarray,
                      ray_norms: jnp.ndarray, samp_near: float,
                      samp_far: float, uniform_blend=None):
    """→ (probe_mids (B, P), weights (B, P)): density profile along rays.

    Probes sit at bin midpoints of a uniform partition of [near, far];
    an ``explore_frac`` of the total mass stays uniform.

    ``uniform_blend`` (traced scalar in [0, 1] or None): blend the
    normalized profile toward the uniform distribution — at 1.0 sampling
    is exactly stratified (the hierarchical coarse pass's coverage), at
    0.0 pure grid-driven.  The annealed explore floor
    (``--occ_explore_anneal``) ramps this 1→0 early in training so the
    model can BOOTSTRAP density everywhere before the grid concentrates
    the budget — the NDC far-plane fix (thin far content starts unlearned,
    loses its mark, and a small static floor never re-finds it).
    """
    B = rays_o.shape[0]
    P = cfg.n_probes
    if cfg.lindisp:
        # disparity-spaced bins, mirroring stratified_samples(lindisp=True)
        inv = jnp.linspace(1.0 / samp_near, 1.0 / samp_far, P + 1,
                           dtype=jnp.float32)
        edges = 1.0 / inv
    else:
        edges = jnp.linspace(samp_near, samp_far, P + 1, dtype=jnp.float32)
    mids = 0.5 * (edges[1:] + edges[:-1])                        # (P,)
    widths = edges[1:] - edges[:-1]                              # (P,)
    z = jnp.broadcast_to(mids, (B, P))
    z_metric = z * ray_norms.reshape(B, 1)
    pts = rays_o[:, None, :] + rays_d_unit[:, None, :] * z_metric[..., None]
    sigma = grid_values(grid, cfg, pts)                          # (B, P)

    # Binarized occupancy (NerfAcc-style): a cell is "occupied" when its
    # alpha over one probe bin clears alpha_thr.  Binarizing spreads the
    # sample budget EVENLY across occupied bins — weighting by raw sigma
    # piles samples onto already-dense cells and starves surface fringes,
    # which measurably hurts novel-view PSNR.
    delta = widths * ray_norms.reshape(B, 1)                     # (B, P)
    alpha = 1.0 - jnp.exp(-sigma * delta)
    occupied = (alpha > cfg.alpha_thr).astype(jnp.float32)
    total = jnp.sum(occupied, axis=-1, keepdims=True)
    floor = cfg.explore_frac * jnp.maximum(total, 1.0) / P
    w = occupied + floor
    if uniform_blend is not None:
        # blend toward uniform-with-equal-total-mass IN w's own scale:
        # at 0.0 this is w bit-exactly (sample_pdf normalizes downstream,
        # so only the relative profile matters)
        mean = jnp.mean(w, axis=-1, keepdims=True)
        w = w + uniform_blend * (mean - w)
    return z, w


def make_occupancy_updater(model_cfg, pos_bands, dir_bands, cfg: OccupancyConfig,
                           *, sigma_activation: str = "relu",
                           pos_include_input: bool = True,
                           dir_include_input: bool = True,
                           pos_encoder: str = "freq", enc_cfg=None,
                           compute_dtype=jnp.bfloat16, chunk: int = 65536,
                           scene_contraction: bool = False,
                           dir_encoder: str = "freq", sh_degree: int = 4,
                           dyn_times: tuple = ()):
    """→ jitted ``update(grid, params, key) -> grid``.

    Queries the model's density at one jittered point per cell and applies
    ``max(grid * decay, sigma)``.  View direction is irrelevant for sigma;
    a fixed unit dir feeds the (unused) color branch.

    To REBUILD the grid from scratch (render-only from a pre-grid
    checkpoint), call with a zero grid: ``update(zeros, params, key)``
    returns exactly the current density field (max(0·decay, sigma) = sigma),
    which is what the EMA converges to.
    """
    from nerf_sandbox_tpu.core.encoding import positional_encoding
    from nerf_sandbox_tpu.models.mlp import nerf_apply

    R = cfg.resolution
    lo = jnp.asarray(cfg.lo, jnp.float32)
    hi = jnp.asarray(cfg.hi, jnp.float32)
    idx = jnp.arange(R ** 3)
    cell = jnp.stack([(idx // (R * R)) % R, (idx // R) % R, idx % R],
                     axis=-1).astype(jnp.float32)                # (R^3, 3)

    @jax.jit
    def update(grid, params, key):
        u = (cell + jax.random.uniform(key, cell.shape)) / R
        pts = lo + u * (hi - lo)                                 # (R^3, 3)
        if cfg.contracted:
            # cells tile contracted space; the model is queried at the
            # WORLD point whose contraction is the jittered cell point
            from nerf_sandbox_tpu.core.encoding import scene_uncontract
            pts = scene_uncontract(pts)

        def density(pts_chunk, t: float | None = None):
            if scene_contraction:
                # grid cells live in world space; the MODEL's encoder sees
                # contracted coords (forward.py) — probe the same way
                from nerf_sandbox_tpu.core.encoding import scene_contract
                pts_chunk = scene_contract(pts_chunk)
            if pos_encoder == "hashgrid":
                from nerf_sandbox_tpu.models.hashgrid import hash_encode
                enc_pos = hash_encode(params["pos_grid"], pts_chunk, enc_cfg)
            elif pos_encoder == "kplanes":
                from nerf_sandbox_tpu.models.kplanes import kplanes_encode
                t01 = (None if t is None else
                       jnp.full((pts_chunk.shape[0],), t, jnp.float32))
                enc_pos = kplanes_encode(params["pos_grid"], pts_chunk,
                                         enc_cfg, compute_dtype=compute_dtype,
                                         t01=t01)
            else:
                enc_pos = positional_encoding(pts_chunk, pos_bands,
                                              include_input=pos_include_input)
            d = jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0], jnp.float32), pts_chunk.shape)
            from nerf_sandbox_tpu.core.encoding import encode_dirs
            enc_dir = encode_dirs(d, dir_bands,
                                  include_input=dir_include_input,
                                  dir_encoder=dir_encoder,
                                  sh_degree=sh_degree)
            # same dtype as training/eval: grid marks near the alpha
            # threshold must not diverge from the configured model
            raw = nerf_apply(params, model_cfg, enc_pos, enc_dir,
                             compute_dtype=compute_dtype)[..., 3]
            if sigma_activation == "softplus":
                return jax.nn.softplus(raw)
            return jax.nn.relu(raw)

        def density_union(pts_chunk):
            # DYNAMIC scenes (4-D kplanes): the 3-D grid must cover the
            # UNION of occupancy over time (a moving object must stay
            # sampleable at every t) — probe a few times and take the max
            if not dyn_times:
                return density(pts_chunk)
            sig = density(pts_chunk, dyn_times[0])
            for t in dyn_times[1:]:
                sig = jnp.maximum(sig, density(pts_chunk, t))
            return sig

        n = pts.shape[0]
        if n > chunk:
            # pad to a whole number of chunks so memory stays bounded at
            # any --occ_res (the tail is masked out by the slice below)
            n_pad = (-n) % chunk
            pts_p = jnp.concatenate([pts, jnp.zeros((n_pad, 3), pts.dtype)])
            sigmas = jax.lax.map(density_union,
                                 pts_p.reshape(-1, chunk, 3)).reshape(-1)[:n]
        else:
            sigmas = density_union(pts)
        return jnp.maximum(grid * cfg.decay, sigmas)

    return update
