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
                        include_input: bool = True) -> jnp.ndarray:
    """Apply gamma(x). ``x``: (..., D); ``freq_bands``: (F,). Returns (..., out_dim).

    Feature layout matches encoders.py:95-104: per-band sin blocks then
    per-band cos blocks, input prepended when ``include_input``.
    """
    fb = freq_bands.astype(x.dtype)
    xb = x[..., None, :] * fb[:, None]              # (..., F, D)
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    enc = jnp.concatenate([sin, cos], axis=-2)       # (..., 2F, D)
    enc = enc.reshape(*x.shape[:-1], -1)             # (..., 2F*D)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def vanilla_encoders():
    """(pos_bands, dir_bands) for official NeRF defaults (encoders.py:108-123).

    Positions: L=10 → 63 out dims. Viewdirs: L=4 → 27 out dims.
    """
    pos = make_frequency_bands(10)
    dirs = make_frequency_bands(4)
    return pos, dirs


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
