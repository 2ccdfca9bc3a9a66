"""Parity + contract tests for stratified and inverse-CDF sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.core.sampling import (
    merge_z_samples, perturb_z_samples, sample_pdf, stratified_samples)


def test_sample_pdf_det_parity_midpoints(golden):
    z = sample_pdf(jnp.asarray(golden["pdf_mids"]),
                   jnp.asarray(golden["pdf_weights"]), 128, deterministic=True)
    np.testing.assert_allclose(np.asarray(z), golden["pdf_z_det"],
                               rtol=1e-5, atol=1e-5)


def test_sample_pdf_det_parity_edges(golden):
    z = sample_pdf(jnp.asarray(golden["pdf_edges"]),
                   jnp.asarray(golden["pdf_weights"]), 128, deterministic=True)
    np.testing.assert_allclose(np.asarray(z), golden["pdf_z_det_edges"],
                               rtol=1e-5, atol=1e-5)


def test_sample_pdf_stochastic_in_range():
    key = jax.random.PRNGKey(0)
    B, M = 8, 63
    mids = jnp.sort(jax.random.uniform(key, (B, M), minval=2.0, maxval=6.0), axis=-1)
    w = jax.random.uniform(jax.random.PRNGKey(1), (B, M))
    z = sample_pdf(mids, w, 64, key=jax.random.PRNGKey(2))
    assert z.shape == (B, 64)
    # samples must lie within the expanded edge range
    lo = mids[:, :1] - 0.5 * (mids[:, 1:2] - mids[:, :1])
    hi = mids[:, -1:] + 0.5 * (mids[:, -1:] - mids[:, -2:-1])
    assert bool(jnp.all(z >= lo - 1e-5)) and bool(jnp.all(z <= hi + 1e-5))


def test_sample_pdf_concentrates_mass():
    # All weight in one bin → nearly all samples land there.
    B, M = 4, 32
    mids = jnp.broadcast_to(jnp.linspace(0.0, 1.0, M), (B, M))
    w = jnp.zeros((B, M)).at[:, 10].set(100.0)
    z = sample_pdf(mids, w, 256, key=jax.random.PRNGKey(0))
    center = mids[0, 10]
    frac_near = jnp.mean((jnp.abs(z - center) < 0.05).astype(jnp.float32))
    assert float(frac_near) > 0.9


def test_stratified_and_perturb():
    z = stratified_samples(2.0, 6.0, 64)
    assert z.shape == (64,)
    assert float(z[0]) == 2.0 and abs(float(z[-1]) - 6.0) < 1e-6
    zb = jnp.broadcast_to(z, (16, 64))
    zp = perturb_z_samples(jax.random.PRNGKey(0), zb)
    # monotone without an explicit sort, within [near, far]
    assert bool(jnp.all(zp[..., 1:] >= zp[..., :-1]))
    assert bool(jnp.all(zp >= 2.0)) and bool(jnp.all(zp <= 6.0))
    # actually jittered
    assert float(jnp.abs(zp - zb).max()) > 1e-4


def test_merge_sorted():
    zc = jnp.broadcast_to(jnp.linspace(0, 1, 8), (4, 8))
    zf = jax.random.uniform(jax.random.PRNGKey(0), (4, 16))
    zm = merge_z_samples(zc, zf)
    assert zm.shape == (4, 24)
    assert bool(jnp.all(zm[..., 1:] >= zm[..., :-1]))


# ---------- mip-NeRF 360 distortion loss ----------

def _distortion_pairwise(z, w, near, far, lindisp=False):
    """O(N^2) reference implementation straight from the paper's Eq. 15."""
    z, w = np.asarray(z, np.float64), np.asarray(w, np.float64)
    g = (1.0 / z) if lindisp else z
    gn = (1.0 / near) if lindisp else near
    gf = (1.0 / far) if lindisp else far
    s = (g - gn) / (gf - gn)
    mids = 0.5 * (s[..., 1:] + s[..., :-1])
    e = np.concatenate([s[..., :1], mids, s[..., -1:]], axis=-1)
    u = 0.5 * (e[..., 1:] + e[..., :-1])
    delta = e[..., 1:] - e[..., :-1]
    inter = np.sum(w[..., :, None] * w[..., None, :]
                   * np.abs(u[..., :, None] - u[..., None, :]), axis=(-2, -1))
    intra = np.sum(w * w * delta, axis=-1) / 3.0
    return float(np.mean(inter + intra))


def test_distortion_loss_matches_pairwise_reference():
    from nerf_sandbox_tpu.core.sampling import distortion_loss
    rng = np.random.default_rng(0)
    z = np.sort(rng.uniform(2.0, 6.0, (8, 32)), axis=-1)
    w = rng.uniform(0.0, 0.3, (8, 32))
    for lindisp, near, far in [(False, 2.0, 6.0), (True, 0.5, 90.0)]:
        zz = np.sort(rng.uniform(near + 0.1, far, (8, 32)), axis=-1) \
            if lindisp else z
        got = float(distortion_loss(jnp.asarray(zz, jnp.float32),
                                    jnp.asarray(w, jnp.float32),
                                    near, far, lindisp=lindisp))
        want = _distortion_pairwise(zz, w, near, far, lindisp=lindisp)
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_distortion_loss_prefers_compact_histograms():
    from nerf_sandbox_tpu.core.sampling import distortion_loss
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 64), (1, 64))
    spike = jnp.zeros((1, 64)).at[0, 30].set(1.0)        # one solid surface
    spread = jnp.full((1, 64), 1.0 / 64)                  # fog
    l_spike = float(distortion_loss(z, spike, 2.0, 6.0))
    l_spread = float(distortion_loss(z, spread, 2.0, 6.0))
    assert l_spike < l_spread / 5
    # empty ray costs nothing
    assert float(distortion_loss(z, jnp.zeros((1, 64)), 2.0, 6.0)) == 0.0
    # gradient exists and pushes fog mass down
    g = jax.grad(lambda ww: distortion_loss(z, ww, 2.0, 6.0))(spread)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.abs(g).max()) > 0


def test_distortion_weight_changes_total_not_metric():
    """--distortion_weight folds into the optimized total while mse_f (the
    PSNR metric) stays pure MSE, in every sampling mode."""
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.models.occupancy import OccupancyConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)
    from tests.test_train_step import _scene

    scene = SceneArrays.from_scene(_scene())
    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                       hidden_dim=32, skip_pos=1)
    prop = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=2,
                      hidden_dim=16, skip_pos=1)
    occ = OccupancyConfig(resolution=8, lo=(-1.5, -1.5, -1.5),
                          hi=(1.5, 1.5, 1.5), n_probes=16)
    spec = RayBatchSpec(rays_per_batch=64, image_h=16, image_w=16)
    pos_b, dir_b = vanilla_encoders()
    tx = make_optimizer(5e-4, "cosine", {"T_max": 100, "eta_min": 5e-6})

    for mode in ("hierarchical", "proposal", "occupancy"):
        def run(dw):
            hyper = TrainHyper(
                model=model, nc=16, nf=16, samp_near=2.0, samp_far=6.0,
                sampling_mode=mode, distortion_weight=dw,
                occ_cfg=occ if mode == "occupancy" else None,
                prop_model=prop if mode == "proposal" else None,
                n_prop=16)
            state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                                     near=2.0, far=6.0)
            fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                                  jnp.asarray(dir_b), base_seed=42)
            args = (state, scene)
            if mode == "occupancy":
                args = (state, scene,
                        jnp.ones((occ.resolution ** 3,), jnp.float32))
            _, m = fn(*args)
            return float(m["loss"]), float(m["mse_f"])

        l0, m0 = run(0.0)
        l1, m1 = run(0.1)
        assert m0 == m1, f"{mode}: mse metric moved with distortion_weight"
        assert l1 > l0, f"{mode}: total loss should include the penalty"
