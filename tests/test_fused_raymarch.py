"""Equivalence: fused Pallas ray-march kernel vs the XLA eval oracle
(interpret mode on CPU; compiled equivalence re-checked on TPU via bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.core.encoding import positional_encoding, vanilla_encoders
from nerf_sandbox_tpu.models.forward import nerf_forward_pass
from nerf_sandbox_tpu.models.mlp import NeRFConfig, init_nerf_params
from nerf_sandbox_tpu.ops.fused_raymarch import fused_raymarch

CFG = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=8, hidden_dim=256,
                 skip_pos=4)


def _rays(b=37, n=21, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    o = jax.random.uniform(k1, (b, 3), minval=-1, maxval=1)
    d = jax.random.normal(k2, (b, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    norms = jax.random.uniform(k3, (b,), minval=0.8, maxval=1.3)
    z = jnp.sort(jax.random.uniform(k4, (b, n), minval=2.0, maxval=6.0), axis=-1)
    return o, d, norms, z


def _oracle(params, o, d, norms, z, pos_b, dir_b, **kw):
    return nerf_forward_pass(
        params, CFG, o, d, z, pos_bands=jnp.asarray(pos_b),
        dir_bands=jnp.asarray(dir_b), white_bkgd=kw.get("white_bkgd", True),
        ray_norms=norms, viewdirs_world_unit=d,
        sigma_activation=kw.get("sigma_activation", "relu"),
        infinite_last_bin=kw.get("infinite_last_bin", True),
        scene_contraction=kw.get("scene_contraction", False),
        compute_dtype=jnp.bfloat16)


def test_fused_raymarch_matches_xla():
    pos_b, dir_b = vanilla_encoders()
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    o, d, norms, z = _rays()
    want = _oracle(params, o, d, norms, z, pos_b, dir_b)
    enc_dir = positional_encoding(d, jnp.asarray(dir_b))
    got = fused_raymarch(params, CFG, o, d, z, norms, enc_dir, pos_b,
                         interpret=True)
    # bf16 accumulation-order differences only
    for g, w, name, tol in zip(got, want, ["comp", "w", "acc", "depth"],
                               [2e-2, 2e-2, 2e-2, 0.1]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=tol,
                                   err_msg=name)


def test_fused_raymarch_options():
    pos_b, dir_b = vanilla_encoders()
    params = init_nerf_params(jax.random.PRNGKey(1), CFG)
    o, d, norms, z = _rays(b=16, n=16, seed=3)
    for kw in ({"white_bkgd": False},
               {"sigma_activation": "softplus"},
               {"infinite_last_bin": False}):
        want = _oracle(params, o, d, norms, z, pos_b, dir_b, **kw)
        enc_dir = positional_encoding(d, jnp.asarray(dir_b))
        got = fused_raymarch(params, CFG, o, d, z, norms, enc_dir, pos_b,
                             interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=2e-2, err_msg=str(kw))
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                                   atol=2e-2, err_msg=str(kw))


def test_fused_raymarch_scene_contraction():
    """In-kernel mip-NeRF 360 contraction == the XLA eval path with
    scene_contraction=True (VERDICT r3 #3). Marching geometry that
    straddles the unit ball so BOTH warp branches are exercised: rays
    from inside the ball out to radius ~7."""
    pos_b, dir_b = vanilla_encoders()
    params = init_nerf_params(jax.random.PRNGKey(2), CFG)
    o, d, norms, z = _rays(b=37, n=21, seed=9)   # z in [2,6] -> r up to ~7
    want = _oracle(params, o, d, norms, z, pos_b, dir_b,
                   scene_contraction=True)
    enc_dir = positional_encoding(d, jnp.asarray(dir_b))
    got = fused_raymarch(params, CFG, o, d, z, norms, enc_dir, pos_b,
                         scene_contraction=True, interpret=True)
    for g, w, name, tol in zip(got, want, ["comp", "w", "acc", "depth"],
                               [2e-2, 2e-2, 2e-2, 0.1]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=tol,
                                   err_msg=name)
    # the warp must actually change the result (guard against a silently
    # ignored flag): same inputs, contraction off
    off = fused_raymarch(params, CFG, o, d, z, norms, enc_dir, pos_b,
                         interpret=True)
    assert np.abs(np.asarray(got[0]) - np.asarray(off[0])).max() > 1e-3


def test_fused_raymarch_padding_independence():
    # results for the first rays must not depend on tile padding
    pos_b, dir_b = vanilla_encoders()
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    o, d, norms, z = _rays(b=130, n=18, seed=5)
    enc_dir = positional_encoding(d, jnp.asarray(dir_b))
    full = fused_raymarch(params, CFG, o, d, z, norms, enc_dir, pos_b,
                          interpret=True)
    small = fused_raymarch(params, CFG, o[:9], d[:9], z[:9], norms[:9],
                           enc_dir[:9], pos_b, interpret=True)
    np.testing.assert_allclose(np.asarray(full[0][:9]), np.asarray(small[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(full[1][:9]), np.asarray(small[1]),
                               atol=1e-5)


def test_fused_raymarch_early_termination():
    """ert_eps: dropped contributions are bounded by eps, and saturated
    tiles actually skip (exact-zero weights past the saturation chunk)."""
    pos_b, dir_b = vanilla_encoders()
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)

    # normal rays: ERT on vs off differ by at most ~eps per channel
    o, d, norms, z = _rays(b=37, n=21, seed=0)
    enc_dir = positional_encoding(d, jnp.asarray(dir_b))
    base = fused_raymarch(params, CFG, o, d, z, norms, enc_dir, pos_b,
                          interpret=True)
    ert = fused_raymarch(params, CFG, o, d, z, norms, enc_dir, pos_b,
                         ert_eps=1e-4, interpret=True)
    np.testing.assert_allclose(np.asarray(ert[0]), np.asarray(base[0]),
                               atol=1e-3, err_msg="comp")
    np.testing.assert_allclose(np.asarray(ert[2]), np.asarray(base[2]),
                               atol=1e-3, err_msg="acc")

    # saturating rays (huge metric deltas): every ray's T collapses in the
    # first chunks, so later chunks must be skipped -> exact-zero weights
    o, d, norms, z = _rays(b=130, n=48, seed=7)
    big = norms * 1e6
    enc_dir = positional_encoding(d, jnp.asarray(dir_b))
    ert = fused_raymarch(params, CFG, o, d, z, big, enc_dir, pos_b,
                         ert_eps=1e-4, interpret=True)
    base = fused_raymarch(params, CFG, o, d, z, big, enc_dir, pos_b,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(ert[0]), np.asarray(base[0]),
                               atol=1e-3)
    assert np.all(np.isfinite(np.asarray(ert[0])))
    w = np.asarray(ert[1])                      # (130, 48)
    # last chunk (samples 32:48) of every ray: exactly zero => skip ran
    assert np.all(w[:, 32:] == 0.0), "saturated tail chunks were not skipped"


def _kp_setup(hybrid=0, seed=4):
    from nerf_sandbox_tpu.models.kplanes import (KPlanesConfig,
                                                 init_kplanes_params)
    kp_cfg = KPlanesConfig(plane_res=(8, 16), plane_features=4, line_res=32,
                           line_features=8, aabb_scale=2.0,
                           hybrid_freqs=hybrid)
    cfg = NeRFConfig(enc_pos_dim=kp_cfg.out_dim, enc_dir_dim=27,
                     n_layers=4, hidden_dim=128, skip_pos=2)
    k = jax.random.PRNGKey(seed)
    params = init_nerf_params(k, cfg)
    params["pos_grid"] = init_kplanes_params(jax.random.fold_in(k, 1),
                                             kp_cfg)
    return params, cfg, kp_cfg


def _kp_oracle(params, cfg, kp_cfg, o, d, norms, z, dir_b, contraction):
    return nerf_forward_pass(
        params, cfg, o, d, z, pos_bands=jnp.zeros((0,)),
        dir_bands=jnp.asarray(dir_b), white_bkgd=True,
        ray_norms=norms, viewdirs_world_unit=d,
        sigma_activation="relu", infinite_last_bin=True,
        pos_encoder="kplanes", enc_cfg=kp_cfg,
        scene_contraction=contraction, compute_dtype=jnp.bfloat16)


def test_fused_raymarch_kplanes_matches_xla():
    """In-kernel k-planes encode == the XLA kplanes eval path (VERDICT r3
    #3 stretch: the fast family takes the fused path)."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    _, dir_b = vanilla_encoders()
    params, cfg, kp_cfg = _kp_setup()
    o, d, norms, z = _rays(b=37, n=21, seed=11)
    want = _kp_oracle(params, cfg, kp_cfg, o, d, norms, z, dir_b, False)
    enc_dir = positional_encoding(d, jnp.asarray(dir_b))
    got = fused_raymarch(params, cfg, o, d, z, norms, enc_dir, None,
                         kp_params=params["pos_grid"], kp_cfg=kp_cfg,
                         interpret=True)
    for g, w, name, tol in zip(got, want, ["comp", "w", "acc", "depth"],
                               [2e-2, 2e-2, 2e-2, 0.1]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=tol,
                                   err_msg=name)


def test_fused_raymarch_kplanes_dynamic_fixed_time():
    """4-D space-time k-planes at a FIXED eval time == the XLA 4-D path:
    the kernel folds the time planes into per-scale (R,F) tables and the
    CP time line into line_x (an exact reduction — a render has one t)."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.models.kplanes import (KPlanesConfig,
                                                 init_kplanes_params)
    _, dir_b = vanilla_encoders()
    kp_cfg = KPlanesConfig(plane_res=(8, 16), plane_features=4, line_res=32,
                           line_features=8, aabb_scale=2.0, time_res=6)
    cfg = NeRFConfig(enc_pos_dim=kp_cfg.out_dim, enc_dir_dim=27,
                     n_layers=4, hidden_dim=128, skip_pos=2)
    k = jax.random.PRNGKey(9)
    params = init_nerf_params(k, cfg)
    params["pos_grid"] = init_kplanes_params(jax.random.fold_in(k, 1),
                                             kp_cfg)
    # break the neutral-1.0 init so time actually modulates features
    for s in range(2):
        for di, nm in enumerate(("xt", "yt", "zt")):
            key = f"plane{s}_{nm}"
            params["pos_grid"][key] = params["pos_grid"][key] + \
                0.3 * jax.random.normal(jax.random.fold_in(k, 11 + 3 * s + di),
                                        params["pos_grid"][key].shape)
    o, d, norms, z = _rays(b=37, n=21, seed=13)
    t_frame = 0.37
    tvec = jnp.full((37,), t_frame, jnp.float32)
    # finite last bin: with RANDOM params the 7-factor bf16 feature
    # product (3 spatial + 3 folded-time + line) puts last-sample sigmas
    # at the relu knife edge, and dt=1e10 amplifies a one-ulp rounding
    # difference into weight 0 vs ~0.96 (same phenomenon the static
    # renderer-level test documents; trained background sigma is
    # decisively negative)
    want = nerf_forward_pass(
        params, cfg, o, d, z, pos_bands=jnp.zeros((0,)),
        dir_bands=jnp.asarray(dir_b), white_bkgd=True,
        ray_norms=norms, viewdirs_world_unit=d,
        sigma_activation="relu", infinite_last_bin=False,
        pos_encoder="kplanes", enc_cfg=kp_cfg, t=tvec,
        compute_dtype=jnp.bfloat16)
    enc_dir = positional_encoding(d, jnp.asarray(dir_b))
    got = fused_raymarch(params, cfg, o, d, z, norms, enc_dir, None,
                         kp_params=params["pos_grid"], kp_cfg=kp_cfg,
                         kp_t=jnp.float32(t_frame),
                         infinite_last_bin=False, interpret=True)
    for g, w, name, tol in zip(got, want, ["comp", "w", "acc", "depth"],
                               [2e-2, 2e-2, 2e-2, 0.1]):
        g, w = np.asarray(g), np.asarray(w)
        if name == "depth":
            # depth = Σw·z / acc: near-empty rays divide bf16 noise by
            # ~0 — compare the raw compositing quantity Σw·z instead
            # (the 7-factor bf16 feature product makes per-weight noise
            # ~1%, which low-acc division amplifies arbitrarily)
            g = g * np.asarray(got[2])
            w = w * np.asarray(want[2])
            tol = 0.12        # = the 2e-2 weight tolerance × z_far 6
        np.testing.assert_allclose(g, w, atol=tol, err_msg=name)


def test_fused_raymarch_kplanes_hybrid_contracted():
    """The unbounded-360 winner's encode — kplanes + hybrid freq channels
    + scene contraction — through the fused kernel."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    _, dir_b = vanilla_encoders()
    params, cfg, kp_cfg = _kp_setup(hybrid=3, seed=6)
    o, d, norms, z = _rays(b=37, n=21, seed=12)   # r spans ~0.1..7
    want = _kp_oracle(params, cfg, kp_cfg, o, d, norms, z, dir_b, True)
    enc_dir = positional_encoding(d, jnp.asarray(dir_b))
    got = fused_raymarch(params, cfg, o, d, z, norms, enc_dir, None,
                         kp_params=params["pos_grid"], kp_cfg=kp_cfg,
                         scene_contraction=True, interpret=True)
    for g, w, name, tol in zip(got, want, ["comp", "w", "acc", "depth"],
                               [2e-2, 2e-2, 2e-2, 0.1]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=tol,
                                   err_msg=name)


def _ipe_oracle(params, o, d, norms, z, pos_b, dir_b, radii, contraction):
    return nerf_forward_pass(
        params, CFG, o, d, z, pos_bands=jnp.asarray(pos_b),
        dir_bands=jnp.asarray(dir_b), white_bkgd=True, ray_norms=norms,
        viewdirs_world_unit=d, sigma_activation="relu",
        infinite_last_bin=True, compute_dtype=jnp.bfloat16,
        scene_contraction=contraction, ipe=True, radii=radii)


def test_fused_raymarch_ipe_matches_xla():
    """In-kernel mip-NeRF IPE == nerf_forward_pass(ipe=True) (VERDICT r4
    #4): frustum moments, diagonal Gaussian lift and per-band attenuation
    all run inside the kernel (streams: interval midpoint/half-width;
    geom slot 7 carries the pixel-cone radius). b=37/n=21 exercises the
    ray- AND sample-padding paths (mu pad = 1 keeps moments finite)."""
    pos_b, dir_b = vanilla_encoders()
    params = init_nerf_params(jax.random.PRNGKey(5), CFG)
    o, d, norms, z = _rays(b=37, n=21, seed=11)
    # realistic pinhole cone radii (~1/fx) up to exaggerated ones that
    # drive the high bands' attenuation to ~0 — both regimes must match
    radii = jax.random.uniform(jax.random.PRNGKey(12), (37,),
                               minval=5e-4, maxval=3e-2)
    want = _ipe_oracle(params, o, d, norms, z, pos_b, dir_b, radii, False)
    enc_dir = positional_encoding(d, jnp.asarray(dir_b))
    got = fused_raymarch(params, CFG, o, d, z, norms, enc_dir, pos_b,
                         ipe_radii=radii, interpret=True)
    for g, w, name, tol in zip(got, want, ["comp", "w", "acc", "depth"],
                               [2e-2, 2e-2, 2e-2, 0.1]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=tol,
                                   err_msg=name)


def test_fused_raymarch_ipe_contracted_matches_xla():
    """IPE + scene contraction: the kernel's closed-form contraction
    Jacobian (J = s·I + c·xx^T) must reproduce contract_gaussian's
    jacfwd-based exact rank-one pushforward. Rays straddle the unit ball
    so both warp branches (J = I inside) are exercised."""
    pos_b, dir_b = vanilla_encoders()
    params = init_nerf_params(jax.random.PRNGKey(6), CFG)
    o, d, norms, z = _rays(b=37, n=21, seed=13)   # z in [2,6] -> r up to ~7
    radii = jax.random.uniform(jax.random.PRNGKey(14), (37,),
                               minval=5e-4, maxval=3e-3)
    want = _ipe_oracle(params, o, d, norms, z, pos_b, dir_b, radii, True)
    enc_dir = positional_encoding(d, jnp.asarray(dir_b))
    got = fused_raymarch(params, CFG, o, d, z, norms, enc_dir, pos_b,
                         ipe_radii=radii, scene_contraction=True,
                         interpret=True)
    for g, w, name, tol in zip(got, want, ["comp", "w", "acc", "depth"],
                               [2e-2, 2e-2, 2e-2, 0.1]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=tol,
                                   err_msg=name)


def test_dotx_limb_split_error_bounds():
    """_dotx (the kernel's exactness scheme for f32 dots with a bf16-exact
    or near-exact co-operand) must sit within its documented error bound:
    <=2^-16 relative of an f64 oracle for typical kernel operands —
    2^9 finer than the one-pass bf16 truncation that caused the round-5
    scored-PSNR bug (RESULTS "Scored-eval path")."""
    from nerf_sandbox_tpu.ops.fused_raymarch import _dotx

    rng = np.random.default_rng(0)
    # one-hot selection of z-like values (split='b'): the relayout case
    oh = np.zeros((64, 128), np.float32)
    oh[np.arange(64), rng.integers(0, 128, 64)] = 1.0
    z = rng.uniform(2.0, 6.0, (128, 128)).astype(np.float32)
    got = np.asarray(_dotx(jnp.asarray(oh), jnp.asarray(z), split="b"))
    want = oh.astype(np.float64) @ z.astype(np.float64)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    assert rel.max() < 2.0 ** -16, rel.max()

    # general x bf16-exact bands (split='a'): the encode-args case
    pts = rng.uniform(-2.0, 2.0, (64, 8)).astype(np.float32)
    B = np.zeros((8, 64), np.float32)
    B[:3] = np.repeat(2.0 ** np.arange(0, 10), 7)[:64][None]
    got = np.asarray(_dotx(jnp.asarray(pts), jnp.asarray(B), split="a"))
    want = pts.astype(np.float64) @ B.astype(np.float64)
    scale = (np.abs(pts.astype(np.float64)) @ np.abs(B.astype(np.float64)))
    rel = np.abs(got - want) / np.maximum(scale, 1e-30)
    assert rel.max() < 2.0 ** -16, rel.max()

    # both-split: non-integer-exponent (lin-spaced) bands — the case the
    # single-split would silently degrade on
    Blin = np.zeros((8, 64), np.float32)
    Blin[:3] = np.linspace(1.0, 512.0, 64)[None]
    got = np.asarray(_dotx(jnp.asarray(pts), jnp.asarray(Blin),
                           split="both"))
    want = pts.astype(np.float64) @ Blin.astype(np.float64)
    scale = np.abs(pts.astype(np.float64)) @ np.abs(Blin.astype(np.float64))
    rel = np.abs(got - want) / np.maximum(scale, 1e-30)
    assert rel.max() < 2.0 ** -15, rel.max()
