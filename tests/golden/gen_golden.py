"""Generate golden parity fixtures by running the PyTorch reference as an oracle.

This is the rebuild's equivalent of the reference's own test-by-parity
strategy (compare_nerf_repos.py): fixed inputs are pushed through the
reference's get_camera_rays / sample_pdf / volume_render_rays /
nerf_forward_pass / NeRF MLP on CPU, and the outputs are stored in
``golden.npz`` for the JAX implementation's unit tests to match.

Run once (requires /root/reference):  python tests/golden/gen_golden.py
The resulting .npz is committed so CI never needs torch or the reference.
"""

import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference")
OUT = Path(__file__).parent / "golden.npz"


def main():
    sys.path.insert(0, str(REF))
    import torch

    from nerf_sandbox.source.utils.ray_utils import get_camera_rays
    from nerf_sandbox.source.utils.sampling_utils import sample_pdf
    from nerf_sandbox.source.utils.render_utils import volume_render_rays, nerf_forward_pass
    from nerf_sandbox.source.models.encoders import PositionalEncoder
    from nerf_sandbox.source.models.mlps import NeRF

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    out = {}

    # ---------------- rays ----------------
    H, W = 24, 32
    f = 30.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    theta = 0.7
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.array([
        [np.cos(theta), 0, np.sin(theta)],
        [0, 1, 0],
        [-np.sin(theta), 0, np.cos(theta)],
    ], dtype=np.float32)
    c2w[:3, 3] = [0.5, -1.2, 3.7]
    pixels = rng.uniform(0, [W, H], size=(64, 2)).astype(np.float32)
    out["rays_K"], out["rays_c2w"], out["rays_pixels"] = K, c2w, pixels
    out["rays_H"], out["rays_W"] = H, W

    for conv in ["opengl", "opencv", "pytorch3d"]:
        r = get_camera_rays(H, W, K, c2w, convention=conv, pixel_center=True,
                            as_ndc=False, pixels_xy=pixels)
        for name, v in zip(["o_world", "d_world_unit", "d_world_norm",
                            "o_march", "d_march_unit", "d_march_norm"], r):
            out[f"rays_{conv}_{name}"] = v.numpy()

    # NDC variant (opengl, near_plane=1.0) — use a forward-facing pose
    c2w_ff = np.eye(4, dtype=np.float32)
    c2w_ff[:3, 3] = [0.1, 0.2, 0.3]
    out["rays_ndc_c2w"] = c2w_ff
    r = get_camera_rays(H, W, K, c2w_ff, convention="opengl", pixel_center=True,
                        as_ndc=True, near_plane=1.0, pixels_xy=pixels)
    for name, v in zip(["o_world", "d_world_unit", "d_world_norm",
                        "o_march", "d_march_unit", "d_march_norm"], r):
        out[f"rays_ndc_{name}"] = v.numpy()

    # ---------------- sample_pdf ----------------
    B, M, S = 16, 63, 128
    mids = np.sort(rng.uniform(2.0, 6.0, size=(B, M)).astype(np.float32), axis=-1)
    weights = rng.uniform(0.0, 1.0, size=(B, M)).astype(np.float32)
    out["pdf_mids"], out["pdf_weights"] = mids, weights
    z_det = sample_pdf(torch.from_numpy(mids), torch.from_numpy(weights), S,
                       deterministic=True)
    out["pdf_z_det"] = z_det.numpy()
    # explicit-u variant: monkeypatch torch.rand via deterministic=False is
    # RNG-dependent, so instead store a second det case with edges input
    edges = np.sort(rng.uniform(0.0, 1.0, size=(B, M + 1)).astype(np.float32), axis=-1)
    out["pdf_edges"] = edges
    z_det2 = sample_pdf(torch.from_numpy(edges), torch.from_numpy(weights), S,
                        deterministic=True)
    out["pdf_z_det_edges"] = z_det2.numpy()

    # ---------------- volume_render_rays ----------------
    B, N = 8, 96
    rgb = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    sigma = np.abs(rng.normal(0, 2, size=(B, N))).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, size=(B, N)).astype(np.float32), axis=-1)
    rn = rng.uniform(0.8, 1.4, size=(B, 1)).astype(np.float32)
    out["vr_rgb"], out["vr_sigma"], out["vr_z"], out["vr_rn"] = rgb, sigma, z, rn
    for ilb in [False, True]:
        for wb in [False, True]:
            c, w, a, d = volume_render_rays(
                torch.from_numpy(rgb), torch.from_numpy(sigma), torch.from_numpy(z),
                ray_norm=torch.from_numpy(rn), white_bkgd=wb, infinite_last_bin=ilb)
            tag = f"vr_{int(ilb)}{int(wb)}"
            out[f"{tag}_c"], out[f"{tag}_w"] = c.numpy(), w.numpy()
            out[f"{tag}_a"], out[f"{tag}_d"] = a.numpy(), d.numpy()

    # ---------------- encoders ----------------
    x = rng.normal(0, 1, size=(32, 3)).astype(np.float32)
    out["enc_x"] = x
    pe10 = PositionalEncoder(input_dims=3, num_freqs=10, include_input=True)
    pe4 = PositionalEncoder(input_dims=3, num_freqs=4, include_input=True)
    pe_lin = PositionalEncoder(input_dims=3, num_freqs=6, include_input=False,
                               log_spaced=False, use_two_pi=True)
    out["enc_pos10"] = pe10(torch.from_numpy(x)).numpy()
    out["enc_dir4"] = pe4(torch.from_numpy(x)).numpy()
    out["enc_lin6_2pi"] = pe_lin(torch.from_numpy(x)).numpy()

    # ---------------- MLP (tied weights) ----------------
    nerf = NeRF(enc_pos_dim=63, enc_dir_dim=27, n_layers=8, hidden_dim=256,
                skip_pos=4)
    sd = {k: v.detach().numpy() for k, v in nerf.state_dict().items()}
    np.savez(Path(__file__).parent / "mlp_state.npz", **sd)
    ep = rng.normal(0, 1, size=(40, 63)).astype(np.float32)
    ed = rng.normal(0, 1, size=(40, 27)).astype(np.float32)
    out["mlp_enc_pos"], out["mlp_enc_dir"] = ep, ed
    with torch.no_grad():
        out["mlp_out"] = nerf(torch.from_numpy(ep), torch.from_numpy(ed)).numpy()
    out["mlp_n_params"] = np.array(sum(p.numel() for p in nerf.parameters()))

    # ---------------- full forward pass (tied weights, no noise) ----------------
    Bf, Nf = 12, 48
    ro = rng.normal(0, 1, size=(Bf, 3)).astype(np.float32)
    rd = rng.normal(0, 1, size=(Bf, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    zf = np.sort(rng.uniform(2, 6, size=(Bf, Nf)).astype(np.float32), axis=-1)
    rnf = rng.uniform(0.9, 1.2, size=(Bf, 1)).astype(np.float32)
    vd = rng.normal(0, 1, size=(Bf, 3)).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    out["fw_ro"], out["fw_rd"], out["fw_z"], out["fw_rn"], out["fw_vd"] = ro, rd, zf, rnf, vd
    pos_enc = PositionalEncoder(input_dims=3, num_freqs=10, include_input=True)
    dir_enc = PositionalEncoder(input_dims=3, num_freqs=4, include_input=True)
    with torch.no_grad():
        comp, wts, acc, depth = nerf_forward_pass(
            rays_o=torch.from_numpy(ro), rays_d_unit=torch.from_numpy(rd),
            z_vals=torch.from_numpy(zf), pos_enc=pos_enc, dir_enc=dir_enc,
            nerf=nerf, white_bkgd=True, ray_norms=torch.from_numpy(rnf),
            viewdirs_world_unit=torch.from_numpy(vd), sigma_activation="relu",
            raw_noise_std=0.0, training=False, infinite_last_bin=True)
    out["fw_comp"], out["fw_w"] = comp.numpy(), wts.numpy()
    out["fw_acc"], out["fw_depth"] = acc.numpy(), depth.numpy()

    np.savez(OUT, **out)
    print(f"wrote {OUT} with {len(out)} arrays")


if __name__ == "__main__":
    main()
