"""Pallas TPU kernel: the whole NeRF MLP fused into one VMEM-resident pass.

Replaces the hot-path chain of 12 XLA matmul dispatches (8-layer skip trunk
+ feature/sigma/color heads, mlps.py:192-278 semantics) with ONE kernel per
sample tile:

* every weight matrix is packed once into MXU-aligned bf16 blocks and
  stays in VMEM across the whole grid (~1.3 MB total — far under the
  16 MB/core budget); per-tile activations live in VMEM
* the skip concat is folded into TWO matmuls (h @ W4_h + enc @ W4_e) —
  no concatenated buffer is materialised
* the sigma head rides along as extra output columns of the feature
  matmul (one (256,384) matmul instead of two dispatches)

Measured reality (RESULTS.md): XLA's own fusion of this chain already runs
at the v5e matmul ceiling for K=256 shapes (~70 TFLOP/s), so this kernel
TIES it at training tile sizes and trails ~20% at eval tiles — it is kept
as a selectable path (``--use_pallas``) and the substrate for deeper
fusion (in-kernel encode/composite, custom VJP), not as the default.

The kernel computes RAW [rgb logits, sigma logit] exactly like
``nerf_apply`` — activations/noise/compositing remain in the caller, so
this is a drop-in replacement validated by equivalence tests
(tests/test_fused_mlp.py) against the XLA oracle.

Shapes are padded to hardware tiles: enc_pos 63→64, enc_dir 27→32 (zero
columns × zero weight rows — exact no-ops), sample count to a multiple of
the 2048-row tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.models.mlp import NeRFConfig

TILE_Q = 2048          # sample rows per grid step (M dim of the matmuls)
OUT_PAD = 128          # output lane width; cols 0..2 rgb, col 3 sigma


def _enc_pads(cfg: NeRFConfig) -> tuple[int, int]:
    """Pad encoder widths up to sublane-friendly sizes (vanilla: 63→64, 27→32)."""
    ep = ((cfg.enc_pos_dim + 63) // 64) * 64
    ed = ((cfg.enc_dir_dim + 31) // 32) * 32
    return ep, ed


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _pad_to(x: jnp.ndarray, rows: int | None = None, cols: int | None = None):
    r = rows if rows is not None else x.shape[0]
    c = cols if cols is not None else x.shape[1]
    return jnp.zeros((r, c), x.dtype).at[:x.shape[0], :x.shape[1]].set(x)


def pack_nerf_params(params, cfg: NeRFConfig, dtype=jnp.bfloat16):
    """Pack the pytree into padded bf16 matrices for the kernel.

    Only the vanilla architecture shape (8x256, skip@4, hidden//2 color) is
    fused; other shapes fall back to the XLA path.
    """
    H = cfg.hidden_dim
    P = cfg.enc_pos_dim
    D = cfg.enc_dir_dim

    def f(x):
        return jnp.asarray(x, dtype)

    EP_PAD, ED_PAD = _enc_pads(cfg)

    trunk = params["trunk"]
    w0 = _pad_to(f(trunk[0]["w"]), EP_PAD, H)                 # (64, 256)
    # mid layers: all (256,256) except the skip layer
    mids, mid_bs = [], []
    for i in range(1, cfg.n_layers):
        if i == cfg.skip_pos:
            continue
        mids.append(f(trunk[i]["w"]))
        mid_bs.append(f(trunk[i]["b"]))
    w_mid = jnp.stack(mids)                                        # (6, 256, 256)
    b_mid = jnp.stack(mid_bs)                                      # (6, 256)

    wskip = trunk[cfg.skip_pos]["w"]                               # (256+63, 256)
    wskip_h = f(wskip[:H])                                         # (256, 256)
    wskip_e = _pad_to(f(wskip[H:]), EP_PAD, H)                # (64, 256)

    # feature + sigma fused: (256, 256 + 128); sigma weight in col 256
    w_sf = jnp.zeros((H, H + 128), dtype)
    w_sf = w_sf.at[:, :H].set(f(params["feature"]["w"]))
    w_sf = w_sf.at[:, H:H + 1].set(f(params["sigma_out"]["w"]))
    b_sf = jnp.zeros((1, H + 128), dtype)
    b_sf = b_sf.at[0, :H].set(f(params["feature"]["b"]))
    b_sf = b_sf.at[0, H].set(f(params["sigma_out"]["b"][0]))

    # color_fc: input [feature(256), enc_dir(27→32 pad)] → (288, 128)
    wc1_raw = params["color_fc"]["w"]                              # (256+27, 128)
    wc1 = jnp.zeros((H + ED_PAD, H // 2), dtype)
    wc1 = wc1.at[:H].set(f(wc1_raw[:H]))
    wc1 = wc1.at[H:H + D].set(f(wc1_raw[H:]))
    bc1 = f(params["color_fc"]["b"]).reshape(1, -1)                # (1, 128)

    wc2 = _pad_to(f(params["color_out"]["w"]), H // 2, OUT_PAD)    # (128, 128)
    bc2 = _pad_to(f(params["color_out"]["b"]).reshape(1, -1), 1, OUT_PAD)

    return {
        "w0": w0, "b0": f(trunk[0]["b"]).reshape(1, -1),
        "w_mid": w_mid, "b_mid": b_mid,
        "wskip_h": wskip_h, "wskip_e": wskip_e,
        "bskip": f(trunk[cfg.skip_pos]["b"]).reshape(1, -1),
        "w_sf": w_sf, "b_sf": b_sf,
        "wc1": wc1, "bc1": bc1, "wc2": wc2, "bc2": bc2,
    }


def _kernel(ep_ref, ed_ref, w0, b0, w_mid, b_mid, wskip_h, wskip_e, bskip,
            w_sf, b_sf, wc1, bc1, wc2, bc2, out_ref, *, skip_pos: int,
            n_layers: int, hidden: int):
    f32 = jnp.float32

    def lin(x, w, b):
        y = jnp.dot(x, w[:], preferred_element_type=f32) + b[:].astype(f32)
        return y

    def relu_bf16(y):
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

    ep = ep_ref[:]                                             # (TQ, 64) bf16
    h = relu_bf16(lin(ep, w0, b0))

    mid_idx = 0
    for layer in range(1, n_layers):
        if layer == skip_pos:
            y = (jnp.dot(h, wskip_h[:], preferred_element_type=f32)
                 + jnp.dot(ep, wskip_e[:], preferred_element_type=f32)
                 + bskip[:].astype(f32))
            h = relu_bf16(y)
        else:
            h = relu_bf16(lin(h, w_mid[mid_idx], b_mid[mid_idx].reshape(1, -1)))
            mid_idx += 1

    sf = lin(h, w_sf, b_sf)                                    # (TQ, 384) f32
    feature = sf[:, :hidden].astype(jnp.bfloat16)
    sigma = sf[:, hidden]                                      # (TQ,)

    color_in = jnp.concatenate([feature, ed_ref[:]], axis=-1)  # (TQ, 288)
    ch = relu_bf16(lin(color_in, wc1, bc1))
    rgb = lin(ch, wc2, bc2)                                    # (TQ, 128) f32

    # out: cols 0..2 = rgb logits, col 3 = sigma logit
    col = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
    out = jnp.where(col == 3, sigma[:, None], rgb)
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_nerf_apply(params, cfg: NeRFConfig, enc_pos, enc_dir,
                     interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused replacement for ``nerf_apply`` (bf16 compute).

    enc_pos (Q, enc_pos_dim), enc_dir (Q, enc_dir_dim) → (Q, 4) f32 raw
    [r, g, b, sigma] logits.
    """
    from jax.experimental import pallas as pl

    Q = enc_pos.shape[0]
    packed = pack_nerf_params(params, cfg)
    EP_PAD, ED_PAD = _enc_pads(cfg)

    q_pad = (-Q) % TILE_Q
    ep = _pad_to(enc_pos.astype(jnp.bfloat16), Q + q_pad, EP_PAD)
    ed = _pad_to(enc_dir.astype(jnp.bfloat16), Q + q_pad, ED_PAD)
    n_tiles = (Q + q_pad) // TILE_Q

    kernel = functools.partial(_kernel, skip_pos=cfg.skip_pos,
                               n_layers=cfg.n_layers, hidden=cfg.hidden_dim)

    weights = [packed["w0"], packed["b0"], packed["w_mid"], packed["b_mid"],
               packed["wskip_h"], packed["wskip_e"], packed["bskip"],
               packed["w_sf"], packed["b_sf"], packed["wc1"], packed["bc1"],
               packed["wc2"], packed["bc2"]]

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_Q, EP_PAD), lambda i: (i, 0)),
            pl.BlockSpec((TILE_Q, ED_PAD), lambda i: (i, 0)),
        ] + [pl.BlockSpec(w.shape, (lambda i, _nd=w.ndim: (0,) * _nd))
             for w in weights],
        out_specs=pl.BlockSpec((TILE_Q, OUT_PAD), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Q + q_pad, OUT_PAD), jnp.float32),
        interpret=interpret,
    )(ep, ed, *weights)

    return out[:Q, :4]


def fusable(cfg: NeRFConfig) -> bool:
    """The kernel covers the reference architecture family: one skip at
    0<skip_pos<n_layers, hidden multiple of 128, and at least one non-skip
    mid layer (n_layers >= 3) for the stacked-mid-weights layout."""
    return (cfg.hidden_dim % 128 == 0 and 0 < cfg.skip_pos < cfg.n_layers
            and cfg.n_layers >= 3)
