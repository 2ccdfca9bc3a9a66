"""K-Planes-style factorized position encoder — the TPU-native fast family.

Role parity: the reference has no fast-encoder family (its encoder is the
frequency encoder, ``nerf_sandbox/source/models/encoders.py:6-106``); this
fills the Instant-NGP slot of BASELINE config #5 with an encoder that is
actually fast on TPU.

Why not a hash grid on TPU (measured, v5e, RESULTS.md):

* random HBM row gathers run at ~116-214M rows/s regardless of row width
  (latency-bound) → 10-44 ms per 98k-sample forward;
* the scatter-add backward is 123 ms (segment_sum) to 745 ms (raw
  ``at[].add``) per step — table training is SparseCore-shaped work that
  XLA on v5e cannot express efficiently;
* Pallas offers no escape: Mosaic's ``tpu.dynamic_gather`` only gathers
  within one vreg (8 sublanes), so VMEM-resident tables are not indexable.

A factorized grid avoids indexed memory entirely. Each scale holds three
feature planes (xy, xz, yz); a sample's feature is the Hadamard product of
its three bilinear plane interpolations (multiplicative combine localizes
like k-planes; Fridovich-Keil et al. 2023). Bilinear interpolation is
expressed as two one-hot matmul contractions per plane:

    f[q, :] = Wu[q, :] @ P @ Wv[q, :]^T     (per feature channel)

where ``Wu/Wv`` are (Q, R) matrices with two adjacent non-zeros
(1-frac, frac). These contract on the MXU in bf16, the intermediate stays
chunk-local, and the backward is two transposed matmuls — no gather or
scatter anywhere. A CP triple of 1-D lines at high resolution
(``line_res``) adds fine axis-aligned detail for negligible FLOPs.

Params live in the model pytree as ``params["pos_grid"]`` exactly like the
hash tables, so the train step, checkpointing, occupancy sampling and mesh
sharding work unchanged (``--encoder kplanes`` on the CLI).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KPlanesConfig(NamedTuple):
    plane_res: tuple = (64, 128)    # multiscale plane resolutions
    plane_features: int = 8         # F per scale
    line_res: int = 512             # CP line resolution (fine detail)
    line_features: int = 16         # CP components
    aabb_scale: float = 1.5         # world coords in [-aabb_scale, aabb_scale]^3
    chunk: int = 32768              # internal Q-chunk (bounds the (Q,R,F)
                                    # intermediate to chunk*R*F elements)
    # >0: concatenate a parameter-free frequency encoding (L=hybrid_freqs,
    # include_input, of the box-normalized coords) to the plane features.
    # Built for contracted UNBOUNDED scenes, where the enclosing background
    # shell contaminates every axis-aligned plane projection (RESULTS.md
    # "Unbounded-360" finding 5) — the freq channels give the MLP an
    # uncontaminated positional signal to disambiguate with. 0 = off.
    hybrid_freqs: int = 0
    # >0: DYNAMIC scenes (the k-planes paper's 4-D formulation): each scale
    # gains three space-time planes (xt, yt, zt) of shape (R, time_res, F)
    # multiplied into the feature product, plus a CP time line. Time planes
    # init at the multiplicative neutral 1.0, so a static scene stays
    # exactly static until the data provides a time gradient. The encoder
    # then requires per-point normalized times t in [0, 1]. 0 = static.
    time_res: int = 0
    # Grid tensor-parallelism switch (the trainer sets it under
    # --mesh_model): contract the planes as einsums over the UNRESHAPED
    # (R,R,F) tables so feature-axis sharding survives both contractions
    # (no table all-gather). Single-chip default stays the reshape-to-
    # (R, R*F) matmul — MEASURED 19% faster at eval scale on v5e (XLA
    # lays the merged minor dim out better than the 3-D dot_general;
    # RESULTS.md "Eval rendering throughput" round-5 note).
    shard_features: bool = False

    @property
    def out_dim(self) -> int:
        d = len(self.plane_res) * self.plane_features + self.line_features
        if self.hybrid_freqs > 0:
            d += 3 + 6 * self.hybrid_freqs          # include_input layout
        return d


def init_kplanes_params(key: jax.Array, cfg: KPlanesConfig) -> dict:
    """Plane/line features ~ N(1, 0.1): products start near 1 with healthy
    gradients to every factor (multiplicative combine)."""
    n_scales = len(cfg.plane_res)
    keys = jax.random.split(key, 3 * n_scales + 3)
    params: dict = {}
    ki = 0
    for s, R in enumerate(cfg.plane_res):
        for name in ("xy", "xz", "yz"):
            params[f"plane{s}_{name}"] = 1.0 + 0.1 * jax.random.normal(
                keys[ki], (R, R, cfg.plane_features), jnp.float32)
            ki += 1
    for name in ("x", "y", "z"):
        params[f"line_{name}"] = 1.0 + 0.1 * jax.random.normal(
            keys[ki], (cfg.line_res, cfg.line_features), jnp.float32)
        ki += 1
    if cfg.time_res > 0:
        # space-time planes init EXACTLY 1.0 (not noisy): the k-planes
        # paper's static-by-default prior — time variation appears only
        # where the data trains it in (and TV on the t axis keeps it
        # smooth). Keys derive by fold_in so static checkpoints/streams
        # are untouched by the feature's existence.
        for s, R in enumerate(cfg.plane_res):
            for name in ("xt", "yt", "zt"):
                params[f"plane{s}_{name}"] = jnp.ones(
                    (R, cfg.time_res, cfg.plane_features), jnp.float32)
        params["line_t"] = jnp.ones((cfg.time_res, cfg.line_features),
                                    jnp.float32)
    return params


def resize_kplanes_params(params: dict, cfg: KPlanesConfig,
                          plane_res: tuple) -> tuple:
    """Bilinearly resample the plane tables to ``plane_res`` →
    (new_params, new_cfg).

    The eval-cost killer for this family is the one-hot plane contraction's
    2·Q·R²·F FLOPs (VERDICT r2 #4 — ~80 TFLOP per 800x800 frame at
    R=(64,128), i.e. ~1 s/frame of pure encode on v5e). Halving R cuts it
    4x. Resampling uses the same endpoint-aligned bilinear kernel the
    encoder itself uses (``_interp_weights``): P' = D P Dᵀ with
    D[j,:] = interp row at u=j/(R'-1) — so a constant/linear plane field is
    reproduced EXACTLY at any resolution and quality loss is confined to
    content above the pooled Nyquist rate (measured in RESULTS.md).
    CP lines are kept at full resolution (<5% of encode FLOPs).
    """
    assert len(plane_res) == len(cfg.plane_res)
    new = dict(params)
    for s, (R_old, R_new) in enumerate(zip(cfg.plane_res, plane_res)):
        if R_new == R_old:
            continue
        D = _interp_weights(jnp.linspace(0.0, 1.0, R_new), R_old)  # (R', R)
        for name in ("xy", "xz", "yz"):
            P = params[f"plane{s}_{name}"]
            new[f"plane{s}_{name}"] = jnp.einsum(
                "ai,bj,ijf->abf", D, D, P,
                precision=jax.lax.Precision.HIGHEST)
        if cfg.time_res > 0:
            # space-time planes pool their SPATIAL axis only (the t axis
            # is cheap — the contraction cost is quadratic in R, linear
            # in time_res)
            for name in ("xt", "yt", "zt"):
                P = params[f"plane{s}_{name}"]
                new[f"plane{s}_{name}"] = jnp.einsum(
                    "ai,itf->atf", D, P,
                    precision=jax.lax.Precision.HIGHEST)
    return new, cfg._replace(plane_res=tuple(plane_res))


def kplanes_tv(params: dict) -> jnp.ndarray:
    """Total-variation regularizer over the plane tables (k-planes §3.2 —
    the family's standard smoothness prior; Fridovich-Keil et al. 2023).

    Mean squared difference of adjacent texels along both plane axes,
    averaged over planes/scales/features. Dense VPU work over the raw
    tables (~400k elements at the default config) — negligible next to a
    train step. CP lines are included for the same reason at the same
    cost. Decoupled from the optimizer so it composes with --lr_grid."""
    tv = 0.0
    n = 0
    for name, P in params.items():
        if name.startswith("plane"):                      # (R, R, F)
            tv = tv + jnp.mean((P[1:] - P[:-1]) ** 2) \
                    + jnp.mean((P[:, 1:] - P[:, :-1]) ** 2)
            n += 2
        elif name.startswith("line"):                     # (R, F)
            tv = tv + jnp.mean((P[1:] - P[:-1]) ** 2)
            n += 1
    return tv / max(n, 1)


def _interp_weights(u01: jnp.ndarray, R: int) -> jnp.ndarray:
    """(Q,) coords in [0,1] → (Q, R) linear-interp weight rows
    (two adjacent non-zeros: 1-frac at u0, frac at u0+1).

    Closed-form hat function relu(1 - |u(R-1) - i|) — identical values to
    the two-one-hot blend (for u in [0, R-1] the hat is exactly 1-frac at
    floor(u) and frac at floor(u)+1) in one fused VPU expression instead
    of two compare/select one-hot builds."""
    u = u01 * (R - 1)
    i = jnp.arange(R, dtype=u01.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - i[None, :]))


def _encode_chunk(params: dict, x01: jnp.ndarray, cfg: KPlanesConfig,
                  compute_dtype, t01: jnp.ndarray | None = None) -> jnp.ndarray:
    """(Qc, 3) normalized coords [+ (Qc,) normalized times] → (Qc, out_dim)."""
    feats = []
    Wt_planes = None
    if cfg.time_res > 0:
        assert t01 is not None, "time_res > 0 needs per-point times"
        Wt_planes = {
            R: _interp_weights(t01, cfg.time_res).astype(compute_dtype)
            for R in set(cfg.plane_res)}          # same rows at every scale
    for s, R in enumerate(cfg.plane_res):
        W = [_interp_weights(x01[:, d], R).astype(compute_dtype)
             for d in range(3)]                                   # 3 x (Qc, R)
        prod = None
        planes = [("xy", (0, 1)), ("xz", (0, 2)), ("yz", (1, 2))]
        for name, (da, db) in planes:
            P = params[f"plane{s}_{name}"].astype(compute_dtype)  # (R, R, F)
            # contract row axis i, then per-point row contraction over j.
            # Two numerically-identical forms of the first contraction
            # (same dot_general contraction, different layout):
            # * shard_features: einsum over the UNRESHAPED (R,R,F) table so
            #   grid TP's feature-axis sharding survives both contractions
            #   (no table all-gather — asserted on the compiled HLO in
            #   tests/test_sharding.py).
            # * default: reshape-to-(R, R*F) matmul — 19% faster at eval
            #   scale single-chip (measured; see KPlanesConfig).
            if cfg.shard_features:
                A = jnp.einsum("qi,ijf->qjf", W[da], P)           # (Qc, R, F)
            else:
                A = (W[da] @ P.reshape(R, -1)).reshape(
                    -1, R, cfg.plane_features)
            f = jnp.einsum("qj,qjf->qf", W[db], A)                # (Qc, F)
            prod = f if prod is None else prod * f
        if cfg.time_res > 0:
            # k-planes 4-D: the three space-time planes join the product
            Wt = Wt_planes[R]                                     # (Qc, T)
            for name, da in (("xt", 0), ("yt", 1), ("zt", 2)):
                P = params[f"plane{s}_{name}"].astype(compute_dtype)  # (R,T,F)
                if cfg.shard_features:
                    A = jnp.einsum("qi,itf->qtf", W[da], P)
                else:
                    A = (W[da] @ P.reshape(R, -1)).reshape(
                        -1, cfg.time_res, cfg.plane_features)
                prod = prod * jnp.einsum("qj,qjf->qf", Wt, A)
        feats.append(prod)
    # CP lines: product of three 1-D interpolations at high resolution
    lw = [_interp_weights(x01[:, d], cfg.line_res).astype(compute_dtype)
          for d in range(3)]
    line = (lw[0] @ params["line_x"].astype(compute_dtype)) * \
           (lw[1] @ params["line_y"].astype(compute_dtype)) * \
           (lw[2] @ params["line_z"].astype(compute_dtype))       # (Qc, Fl)
    if cfg.time_res > 0:
        ltw = _interp_weights(t01, cfg.time_res).astype(compute_dtype)
        line = line * (ltw @ params["line_t"].astype(compute_dtype))
    feats.append(line)
    return jnp.concatenate(feats, axis=-1).astype(jnp.float32)


def kplanes_encode(params: dict, pts_world: jnp.ndarray,
                   cfg: KPlanesConfig,
                   compute_dtype=jnp.bfloat16,
                   t01: jnp.ndarray | None = None) -> jnp.ndarray:
    """Encode world points (Q, 3) [+ times (Q,) in [0,1]] → (Q, out_dim).

    Chunked over Q (lax.map) so the (chunk, R, F) matmul intermediate stays
    small enough to fuse/fit; differentiates cleanly (backward is the
    transposed matmul chain, still chunked).
    """
    Q = pts_world.shape[0]
    x01 = jnp.clip(pts_world / (2.0 * cfg.aabb_scale) + 0.5, 0.0, 1.0)
    if cfg.time_res > 0:
        assert t01 is not None, "KPlanesConfig.time_res > 0 needs times"
        t01 = jnp.clip(t01.reshape(Q), 0.0, 1.0)
    if Q <= cfg.chunk:
        feats = _encode_chunk(params, x01, cfg, compute_dtype, t01=t01)
    elif cfg.time_res > 0:
        n_chunks = -(-Q // cfg.chunk)
        pad = n_chunks * cfg.chunk - Q
        xp = jnp.pad(x01, ((0, pad), (0, 0))).reshape(n_chunks, cfg.chunk, 3)
        tp = jnp.pad(t01, (0, pad)).reshape(n_chunks, cfg.chunk)
        out = jax.lax.map(
            lambda xt: _encode_chunk(params, xt[0], cfg, compute_dtype,
                                     t01=xt[1]), (xp, tp))
        feats = out.reshape(n_chunks * cfg.chunk, -1)[:Q]
    else:
        n_chunks = -(-Q // cfg.chunk)
        pad = n_chunks * cfg.chunk - Q
        xp = jnp.pad(x01, ((0, pad), (0, 0))).reshape(n_chunks, cfg.chunk, 3)
        out = jax.lax.map(
            lambda xc: _encode_chunk(params, xc, cfg, compute_dtype), xp)
        feats = out.reshape(n_chunks * cfg.chunk, -1)[:Q]
    if cfg.hybrid_freqs > 0:
        # parameter-free frequency channels of the box-normalized coords
        # ([-1,1]; same coords the planes see) — cheap (no tables), fp32
        from nerf_sandbox_tpu.core.encoding import (make_frequency_bands,
                                                    positional_encoding)
        bands = jnp.asarray(make_frequency_bands(cfg.hybrid_freqs),
                            jnp.float32)
        freq = positional_encoding((x01 * 2.0 - 1.0).astype(jnp.float32),
                                   bands)
        feats = jnp.concatenate([feats, freq], axis=-1)
    return feats
