"""Instant-NGP-style multiresolution hash-grid position encoder.

This is the rebuild's stretch model family (BASELINE.json config #5): it
exercises the encoder/MLP abstraction beyond vanilla NeRF — the hash tables
are TRAINABLE parameters living in the same params pytree as the MLP, so
the existing fused train step / checkpointing / mesh sharding work
unchanged (`--encoder hashgrid` on the CLI).

Design (Müller et al. 2022, re-derived for TPU):

* L levels with resolutions N_l = floor(N_min · b^l), b chosen so the top
  level hits ``max_res``
* each level owns a (2^log2_size, F) feature table; corner lookup via the
  spatial hash  h(v) = (x ⊕ y·2654435761 ⊕ z·805459861) mod 2^T
* trilinear interpolation of the 8 corner features, concatenated over
  levels → (Q, L·F) encoding that replaces γ(x)

TPU notes: the 8·L table gathers are genuine dynamic gathers (tables are
too large for the one-hot trick); they are batched as a single (L·8·Q)
row gather per level group to amortise. Positions are normalised to
[0,1]^3 from a symmetric world AABB (``aabb_scale``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class HashGridConfig(NamedTuple):
    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_res: int = 16
    max_res: int = 512
    aabb_scale: float = 1.0     # world coords in [-aabb_scale, aabb_scale]^3
    chunk: int = 131072         # internal Q-chunk: bounds the (L, Q, 8, ...)
                                # corner intermediates (unchunked, a 2M-point
                                # eval tile built >16GB of them — HBM OOM)

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    def level_resolutions(self) -> np.ndarray:
        if self.n_levels == 1:
            return np.array([self.base_res], np.int32)
        b = np.exp((np.log(self.max_res) - np.log(self.base_res))
                   / (self.n_levels - 1))
        return np.floor(self.base_res * b ** np.arange(self.n_levels)
                        ).astype(np.int32)


_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


def init_hash_tables(key: jax.Array, cfg: HashGridConfig) -> jnp.ndarray:
    """(L, 2^T, F) feature tables, U(-1e-4, 1e-4) like Instant-NGP."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.n_features),
        minval=-1e-4, maxval=1e-4, dtype=jnp.float32)


def _hash_corner(coords: jnp.ndarray, log2_size: int) -> jnp.ndarray:
    """Spatial hash of integer corner coords (..., 3) → (...) uint32 index."""
    c = coords.astype(jnp.uint32)
    h = (c[..., 0] * _PRIMES[0]) ^ (c[..., 1] * _PRIMES[1]) ^ (c[..., 2] * _PRIMES[2])
    return (h & jnp.uint32((1 << log2_size) - 1)).astype(jnp.int32)


# 8 cube corner offsets, shaped for broadcasting: (8, 3)
_CORNERS = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                indexing="ij"), -1).reshape(8, 3)


def hash_encode(tables: jnp.ndarray, pts_world: jnp.ndarray,
                cfg: HashGridConfig) -> jnp.ndarray:
    """Encode world points (Q, 3) → (Q, L·F).

    Chunked over Q (lax.map) so the (L, Q, 8, ...) corner/weight
    intermediates stay bounded at any tile size (eval renders hand this
    2M+ points per tile)."""
    Q = pts_world.shape[0]
    if Q > cfg.chunk:
        n_chunks = -(-Q // cfg.chunk)
        pad = n_chunks * cfg.chunk - Q
        xp = jnp.pad(pts_world, ((0, pad), (0, 0))).reshape(
            n_chunks, cfg.chunk, 3)
        out = jax.lax.map(lambda xc: _hash_encode_chunk(tables, xc, cfg), xp)
        return out.reshape(n_chunks * cfg.chunk, cfg.out_dim)[:Q]
    return _hash_encode_chunk(tables, pts_world, cfg)


def _hash_encode_chunk(tables: jnp.ndarray, pts_world: jnp.ndarray,
                       cfg: HashGridConfig) -> jnp.ndarray:
    x01 = jnp.clip(pts_world / (2.0 * cfg.aabb_scale) + 0.5, 0.0, 1.0)
    resolutions = jnp.asarray(cfg.level_resolutions(), jnp.float32)   # (L,)

    # scaled coords per level: (L, Q, 3)
    xl = x01[None, :, :] * (resolutions[:, None, None] - 1.0)
    x0 = jnp.floor(xl)
    frac = xl - x0                                                    # (L, Q, 3)
    corners = x0[:, :, None, :] + jnp.asarray(_CORNERS, jnp.float32)  # (L,Q,8,3)

    idx = _hash_corner(corners, cfg.log2_table_size)                  # (L, Q, 8)

    # ONE flat gather over a level-offset index instead of a vmapped
    # (batched) gather per level — the batched form lowers ~2x slower on
    # TPU. Random-access HBM gathers remain the cost here (~0.5 us/kB);
    # a Pallas VMEM-resident gather kernel is the roadmap fix.
    L = cfg.n_levels
    T = cfg.table_size
    flat_idx = idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]
    feats = tables.reshape(L * T, cfg.n_features)[flat_idx.reshape(-1)]
    feats = feats.reshape(L, pts_world.shape[0], 8, cfg.n_features)   # (L,Q,8,F)

    # trilinear weights: prod over dims of (frac or 1-frac)
    cb = jnp.asarray(_CORNERS, jnp.float32)                           # (8, 3)
    w = jnp.prod(frac[:, :, None, :] * cb + (1.0 - frac[:, :, None, :]) * (1.0 - cb),
                 axis=-1)                                             # (L, Q, 8)
    out = jnp.sum(feats * w[..., None], axis=2)                       # (L, Q, F)
    return jnp.moveaxis(out, 0, 1).reshape(pts_world.shape[0], cfg.out_dim)
