"""The Fig.-7 NeRF MLP as a pure pytree + apply function.

Parity target: ``nerf_sandbox/source/models/mlps.py:35-314`` (``NeRF``):

* ``n_layers`` x ``hidden_dim`` ReLU trunk; the layer at index ``skip_pos``
  receives ``[h, gamma(x)]`` concatenated into its INPUT (mlps.py:93-104,
  224-244).
* Heads: ``feature`` (hidden→hidden, no activation), ``sigma_out``
  (hidden→1, raw), ``color_fc`` ((hidden+enc_dir)→hidden//2, ReLU),
  ``color_out`` (hidden//2→3, raw).  Output is ``[rgb_raw, sigma_raw]``
  (Q, 4) — activations are applied by the caller (mlps.py:264-278).
* Init: trunk/color_fc Kaiming-uniform (relu gain), feature Kaiming-uniform
  (linear gain), zero biases (mlps.py:178-190); sigma_out/color_out keep the
  PyTorch ``nn.Linear`` default init.  Optional sigma-bias init solving
  ``1-exp(-sigma*·(far-near)) = p`` (mlps.py:119-176).

TPU notes: weights are stored (in, out) so the apply is a chain of
``x @ W`` 256-wide matmuls — MXU-shaped when the sample batch is large.
The params pytree is replicated across the mesh by the parallel layer and
streamed into VMEM by the fused Pallas kernel.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NeRFConfig(NamedTuple):
    enc_pos_dim: int
    enc_dir_dim: int
    n_layers: int = 8
    hidden_dim: int = 256
    skip_pos: int = 4
    # NeRF-W-style appearance code width (beyond-reference): >0 widens the
    # color head input to [feature, enc_dir, app]. The per-frame code table
    # itself lives in the train state (init_train_state); eval renders fold
    # a fixed code into the color_fc bias (fold_appearance) so every eval
    # path — XLA and the fused Pallas kernel — runs the app-free shape.
    app_dim: int = 0


def _kaiming_uniform(key, fan_in: int, shape, gain: float) -> jnp.ndarray:
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def _torch_linear_default(key, fan_in: int, fan_out: int):
    """PyTorch nn.Linear default init: W,b ~ U(±1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound,
                           dtype=jnp.float32)
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound,
                           dtype=jnp.float32)
    return w, b


def sigma_bias_for_initial_acc_opacity(initial_acc_opacity: float, near: float,
                                       far: float, activation: str = "softplus") -> float:
    """Solve activation(b) = sigma* with 1-exp(-sigma*·L) = p (mlps.py:136-176)."""
    p = float(max(1e-6, min(0.99, initial_acc_opacity)))
    L = float(max(1e-8, far - near))
    sigma_star = -math.log(1.0 - p) / L
    act = (activation or "softplus").lower()
    if act == "softplus":
        return float(math.log(math.expm1(sigma_star)))
    return float(sigma_star)


def trunk_in_dims(cfg: NeRFConfig) -> list[int]:
    """in_features per trunk layer, incl. the widened skip layer (mlps.py:93-102)."""
    dims = []
    in_dim = cfg.enc_pos_dim
    for idx in range(cfg.n_layers):
        dims.append(in_dim + cfg.enc_pos_dim if idx == cfg.skip_pos else in_dim)
        in_dim = cfg.hidden_dim
    return dims


def init_nerf_params(
    key: jax.Array,
    cfg: NeRFConfig,
    *,
    near: float = 2.0,
    far: float = 6.0,
    initial_acc_opacity: float | None = None,
    sigma_activation: str = "softplus",
) -> Dict[str, Any]:
    """Initialise the full parameter pytree."""
    relu_gain = math.sqrt(2.0)
    keys = jax.random.split(key, cfg.n_layers + 4)

    trunk = []
    for idx, fan_in in enumerate(trunk_in_dims(cfg)):
        w = _kaiming_uniform(keys[idx], fan_in, (fan_in, cfg.hidden_dim), relu_gain)
        trunk.append({"w": w, "b": jnp.zeros((cfg.hidden_dim,), jnp.float32)})

    h = cfg.hidden_dim
    feature_w = _kaiming_uniform(keys[cfg.n_layers], h, (h, h), gain=1.0)
    sigma_w, sigma_b = _torch_linear_default(keys[cfg.n_layers + 1], h, 1)
    color_fc_in = h + cfg.enc_dir_dim + cfg.app_dim
    color_fc_w = _kaiming_uniform(keys[cfg.n_layers + 2], color_fc_in,
                                  (color_fc_in, h // 2), relu_gain)
    color_out_w, color_out_b = _torch_linear_default(keys[cfg.n_layers + 3], h // 2, 3)

    params = {
        "trunk": trunk,
        "feature": {"w": feature_w, "b": jnp.zeros((h,), jnp.float32)},
        "sigma_out": {"w": sigma_w, "b": sigma_b},
        "color_fc": {"w": color_fc_w, "b": jnp.zeros((h // 2,), jnp.float32)},
        "color_out": {"w": color_out_w, "b": color_out_b},
    }

    if initial_acc_opacity is not None:
        b = sigma_bias_for_initial_acc_opacity(
            initial_acc_opacity, near=near, far=far, activation=sigma_activation)
        params["sigma_out"]["b"] = jnp.full((1,), b, jnp.float32)
        params["color_out"]["b"] = jnp.zeros((3,), jnp.float32)
        params["color_out"]["w"] = params["color_out"]["w"] * 0.1

    return params


def nerf_apply(params: Dict[str, Any], cfg: NeRFConfig, enc_pos: jnp.ndarray,
               enc_dir: jnp.ndarray, compute_dtype=None,
               app: jnp.ndarray | None = None) -> jnp.ndarray:
    """Forward pass → (Q, 4) raw [r, g, b, sigma] logits (mlps.py:192-278).

    ``compute_dtype=jnp.bfloat16`` runs the trunk matmuls and activations in
    bf16 (params are cast per-use; master params stay fp32).  This is the
    TPU analogue of the reference's fp16 AMP autocast (trainer.py:396-397,
    899): halves HBM activation traffic and doubles MXU rate.  Heads return
    fp32 logits either way.
    """
    ct = compute_dtype

    def lin(x, layer):
        w, b = layer["w"], layer["b"]
        if ct is not None:
            x, w, b = x.astype(ct), w.astype(ct), b.astype(ct)
        return x @ w + b

    h = enc_pos if ct is None else enc_pos.astype(ct)
    enc_pos_c = h
    for idx, layer in enumerate(params["trunk"]):
        if idx == cfg.skip_pos:
            h = jnp.concatenate([h, enc_pos_c], axis=-1)
        h = jax.nn.relu(lin(h, layer))

    sigma_raw = lin(h, params["sigma_out"]).astype(jnp.float32)               # (Q,1)
    feature = lin(h, params["feature"])                                       # (Q,H)

    enc_dir_c = enc_dir if ct is None else enc_dir.astype(ct)
    color_parts = [feature, enc_dir_c]
    if getattr(cfg, "app_dim", 0):
        # Callers outside the train step (occupancy density probes, debug
        # forwards) pass no code — the zero code IS the canonical
        # appearance (the code table is initialised near zero).
        if app is None:
            app = jnp.zeros((enc_dir.shape[0], cfg.app_dim), jnp.float32)
        color_parts.append(app if ct is None else app.astype(ct))
    color_in = jnp.concatenate(color_parts, axis=-1)
    color_h = jax.nn.relu(lin(color_in, params["color_fc"]))
    color_raw = lin(color_h, params["color_out"]).astype(jnp.float32)         # (Q,3)

    return jnp.concatenate([color_raw, sigma_raw], axis=-1)


def init_appearance_table(key: jax.Array, n_frames: int,
                          app_dim: int) -> jnp.ndarray:
    """(n_frames, app_dim) per-frame appearance codes (NeRF-W, Martin-Brualla
    et al. 2021). Near-zero init so the zero code — what eval uses for
    held-out frames by default — starts as the canonical appearance."""
    return 0.01 * jax.random.normal(key, (n_frames, app_dim), jnp.float32)


def fold_appearance(params: Dict[str, Any], cfg: NeRFConfig,
                    app_vec: jnp.ndarray):
    """Fold a FIXED appearance code into the color head → app-free model.

    ``color_fc`` input is ``[feature, enc_dir, app]``; with a constant
    ``app_vec`` the app rows contribute a constant ``app_vec @ W_app`` which
    folds into the bias.  The returned (params, cfg) pair has the exact
    app-free architecture — eval renderers (XLA and the fused Pallas
    kernel, which has no appearance branch) run it unchanged.
    """
    if not cfg.app_dim:
        return params, cfg
    split = cfg.hidden_dim + cfg.enc_dir_dim
    w = params["color_fc"]["w"]                       # (split+app, h//2)
    app_vec = jnp.asarray(app_vec, jnp.float32).reshape(cfg.app_dim)
    folded = dict(params)
    folded["color_fc"] = {
        "w": w[:split],
        "b": params["color_fc"]["b"] + app_vec @ w[split:],
    }
    folded.pop("app_emb", None)
    return folded, cfg._replace(app_dim=0)


def param_count(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def params_from_torch_state_dict(state_dict, cfg: NeRFConfig) -> Dict[str, Any]:
    """Convert a reference NeRF ``state_dict`` (numpy arrays) to our pytree.

    Torch Linear stores weight (out, in); we store (in, out) → transpose.
    Used by parity tests / the compare harness for tied-weight comparisons
    (compare_nerf_repos.py:508-591 plays the same role in the reference).
    """
    def lin(prefix):
        return {"w": jnp.asarray(np.asarray(state_dict[f"{prefix}.weight"]).T),
                "b": jnp.asarray(np.asarray(state_dict[f"{prefix}.bias"]))}

    return {
        "trunk": [lin(f"mlp.{i}") for i in range(cfg.n_layers)],
        "feature": lin("feature"),
        "sigma_out": lin("sigma_out"),
        "color_fc": lin("color_fc"),
        "color_out": lin("color_out"),
    }
