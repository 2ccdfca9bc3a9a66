"""Parity harness: compare this JAX framework against the PyTorch reference.

Role parity: ``nerf_sandbox/source/scripts/compare_nerf_repos.py`` (the
reference compares itself against bmild nerf-pytorch; we compare against the
reference itself — the rebuild's golden oracle, SURVEY.md §4):

* loader parity: intrinsics + poses on a synthetic Blender scene
* camera-ray parity (world + NDC) per convention
* deterministic ``sample_pdf`` parity
* MLP architecture table + tied-weight forward parity
  (torch ``state_dict`` → our pytree)
* integrator parity (``volume_render_rays``)
* end-to-end tied-weight forward-pass RGB parity
* OK/WARN/FAIL grading + JSON report

Run (needs the reference checkout + torch, CPU only):

    python -m nerf_sandbox_tpu.scripts.compare_with_reference \
        --reference_path /root/reference --out report.json
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

# thresholds in the spirit of compare_nerf_repos.py:96-104
OK, WARN = 1e-5, 1e-3


def _grade(name: str, diff: float, ok=OK, warn=WARN):
    status = "OK" if diff <= ok else ("WARN" if diff <= warn else "FAIL")
    print(f"  [{status:4s}] {name}: max|Δ| = {diff:.3e}")
    return {"name": name, "max_abs_diff": float(diff), "status": status}


def _make_blender_scene(root: Path, n=3, size=16):
    import imageio.v2 as imageio
    (root / "train").mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    frames = []
    for i in range(n):
        img = rng.randint(0, 255, (size, size, 4), np.uint8)
        imageio.imwrite(root / "train" / f"r_{i}.png", img)
        th = 0.3 * i
        c2w = np.eye(4)
        c2w[:3, :3] = [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                       [-np.sin(th), 0, np.cos(th)]]
        c2w[:3, 3] = np.asarray(c2w[:3, :3]) @ np.array([0.2, -0.1, 4.0])
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    (root / "transforms_train.json").write_text(
        json.dumps({"camera_angle_x": 0.6911, "frames": frames}))
    return root


def main(argv=None):
    ap = argparse.ArgumentParser("JAX-vs-PyTorch-reference parity harness")
    ap.add_argument("--reference_path", type=str, default="/root/reference")
    ap.add_argument("--data_root", type=str, default=None,
                    help="Blender scene dir; synthetic tmp scene if omitted")
    ap.add_argument("--out", type=str, default="parity_report.json")
    ap.add_argument("--rays", type=int, default=256)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    sys.path.insert(0, args.reference_path)
    try:
        import torch
        from nerf_sandbox.source.utils.ray_utils import get_camera_rays as ref_rays
        from nerf_sandbox.source.utils.sampling_utils import sample_pdf as ref_pdf
        from nerf_sandbox.source.utils.render_utils import (
            volume_render_rays as ref_vr, nerf_forward_pass as ref_fwd)
        from nerf_sandbox.source.models.encoders import PositionalEncoder as RefEnc
        from nerf_sandbox.source.models.mlps import NeRF as RefNeRF
        from nerf_sandbox.source.data.loaders.blender_loader import (
            BlenderSceneLoader as RefBlender)
    except Exception as e:
        print(f"FATAL: cannot import the PyTorch reference from "
              f"{args.reference_path}: {e}")
        return 2

    from nerf_sandbox_tpu.core.rays import get_camera_rays
    from nerf_sandbox_tpu.core.sampling import sample_pdf
    from nerf_sandbox_tpu.core.integrator import volume_render_rays
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.blender_loader import BlenderSceneLoader
    from nerf_sandbox_tpu.models.forward import nerf_forward_pass
    from nerf_sandbox_tpu.models.mlp import (
        NeRFConfig, params_from_torch_state_dict, trunk_in_dims)

    results = []
    rng = np.random.RandomState(0)

    # ---------------- 1. loader parity ----------------
    print("[1] loader parity (Blender)")
    if args.data_root:
        root = Path(args.data_root)
    else:
        root = _make_blender_scene(Path(tempfile.mkdtemp(prefix="parity_")) / "scene")
    ref_scene = RefBlender(root, downscale=1, white_bkgd=True).load("train")
    my_scene = BlenderSceneLoader(root, downscale=1, white_bkgd=True).load("train")
    dK = max(float(np.abs(np.asarray(rf.K) - np.asarray(mf.K)).max())
             for rf, mf in zip(ref_scene.frames, my_scene.frames))
    dp = max(float(np.abs(np.asarray(rf.c2w) - np.asarray(mf.c2w)).max())
             for rf, mf in zip(ref_scene.frames, my_scene.frames))
    di = max(float(np.abs(np.asarray(rf.image) - np.asarray(mf.image)).max())
             for rf, mf in zip(ref_scene.frames, my_scene.frames))
    results.append(_grade("intrinsics", dK))
    results.append(_grade("poses", dp))
    results.append(_grade("images", di))

    # ---------------- 1b. LLFF loader parity ----------------
    print("[1b] loader parity (LLFF: scale, recenter, holdout, near/far)")
    llff_root = ref_tr = my_tr = None       # also consumed by check 9
    try:
        from nerf_sandbox.source.data.loaders.llff_loader import (
            LLFFSceneLoader as RefLLFF)
        from nerf_sandbox_tpu.data.llff_loader import LLFFSceneLoader

        import sys as _sys
        _sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
        from tests.make_llff_scene import make_llff_scene
        llff_root = make_llff_scene(
            Path(tempfile.mkdtemp(prefix="parity_llff_")) / "scene",
            views=8, size=24)

        ref_l = RefLLFF(llff_root, downscale=1, white_bkgd=True)
        my_l = LLFFSceneLoader(llff_root, downscale=1, white_bkgd=True)
        ref_tr, my_tr = ref_l.load("train"), my_l.load("train")
        assert len(ref_tr.frames) == len(my_tr.frames)
        dp = max(float(np.abs(np.asarray(rf.c2w) - np.asarray(mf.c2w)).max())
                 for rf, mf in zip(ref_tr.frames, my_tr.frames))
        dK = max(float(np.abs(np.asarray(rf.K) - np.asarray(mf.K)).max())
                 for rf, mf in zip(ref_tr.frames, my_tr.frames))
        results.append(_grade("llff poses (scaled+recentered)", dp, ok=1e-4))
        results.append(_grade("llff intrinsics", dK, ok=1e-4))
        nf_ref = ref_l.get_global_near_far()
        nf_my = my_l.get_global_near_far()
        results.append(_grade("llff near/far percentiles",
                              max(abs(nf_ref[0] - nf_my[0]),
                                  abs(nf_ref[1] - nf_my[1])), ok=1e-5))
        ref_val, my_val = ref_l.load("val"), my_l.load("val")
        same_holdout = len(ref_val.frames) == len(my_val.frames) and all(
            np.allclose(np.asarray(a.c2w), np.asarray(b.c2w), atol=1e-4)
            for a, b in zip(ref_val.frames, my_val.frames))
        results.append({"name": "llff holdout split",
                        "max_abs_diff": 0.0 if same_holdout else 1.0,
                        "status": "OK" if same_holdout else "FAIL"})
        print(f"  [{'OK' if same_holdout else 'FAIL':4s}] llff holdout split")
    except Exception as e:
        print(f"  [FAIL] llff loader parity errored: {e}")
        results.append({"name": "llff loader parity", "max_abs_diff": 1.0,
                        "status": "FAIL"})

    # ---------------- 2. camera-ray parity ----------------
    print("[2] camera-ray parity")
    fr = ref_scene.frames[0]
    H, W = fr.image.shape[:2]
    px = rng.uniform(0, [W, H], size=(args.rays, 2)).astype(np.float32)
    for conv in ["opengl", "opencv", "pytorch3d"]:
        r_ref = ref_rays(H, W, fr.K, fr.c2w, convention=conv,
                         pixel_center=True, as_ndc=False, pixels_xy=px)
        r_my = get_camera_rays(jnp.asarray(np.asarray(fr.K)),
                               jnp.asarray(np.asarray(fr.c2w)),
                               jnp.asarray(px), image_h=H, image_w=W,
                               convention=conv, pixel_center=True)
        d = max(float(np.abs(np.asarray(a) - b.numpy()).max())
                for a, b in zip(r_my, r_ref))
        results.append(_grade(f"world rays [{conv}]", d))
    # NDC
    r_ref = ref_rays(H, W, fr.K, fr.c2w, convention="opengl", pixel_center=True,
                     as_ndc=True, near_plane=1.0, pixels_xy=px)
    r_my = get_camera_rays(jnp.asarray(np.asarray(fr.K)),
                           jnp.asarray(np.asarray(fr.c2w)), jnp.asarray(px),
                           image_h=H, image_w=W, convention="opengl",
                           pixel_center=True, as_ndc=True, near_plane=1.0)
    d = max(float(np.abs(np.asarray(a) - b.numpy()).max())
            for a, b in zip(r_my, r_ref))
    results.append(_grade("NDC rays", d, ok=1e-4))

    # ---------------- 3. sample_pdf parity (deterministic) ----------------
    print("[3] deterministic sample_pdf parity")
    B, M, S = 16, 63, 128
    mids = np.sort(rng.uniform(2, 6, (B, M)).astype(np.float32), -1)
    w = rng.uniform(0, 1, (B, M)).astype(np.float32)
    z_ref = ref_pdf(torch.from_numpy(mids), torch.from_numpy(w), S,
                    deterministic=True).numpy()
    z_my = np.asarray(sample_pdf(jnp.asarray(mids), jnp.asarray(w), S,
                                 deterministic=True))
    results.append(_grade("sample_pdf (midpoints)", float(np.abs(z_my - z_ref).max()),
                          ok=1e-4))

    # ---------------- 4. MLP arch + tied-weight parity ----------------
    print("[4] MLP architecture + tied weights")
    cfg = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27)
    torch.manual_seed(0)
    ref_mlp = RefNeRF(enc_pos_dim=63, enc_dir_dim=27, n_layers=8,
                      hidden_dim=256, skip_pos=4)
    ref_dims = [l.in_features for l in ref_mlp.mlp]
    my_dims = trunk_in_dims(cfg)
    arch_ok = ref_dims == my_dims
    print(f"  [{'OK' if arch_ok else 'FAIL'}] trunk in_features {my_dims}")
    results.append({"name": "mlp_arch", "max_abs_diff": 0.0 if arch_ok else 1.0,
                    "status": "OK" if arch_ok else "FAIL"})

    sd = {k: v.detach().numpy() for k, v in ref_mlp.state_dict().items()}
    params = params_from_torch_state_dict(sd, cfg)
    ep = rng.normal(0, 1, (64, 63)).astype(np.float32)
    ed = rng.normal(0, 1, (64, 27)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref_mlp(torch.from_numpy(ep), torch.from_numpy(ed)).numpy()
    from nerf_sandbox_tpu.models.mlp import nerf_apply
    out_my = np.asarray(nerf_apply(params, cfg, jnp.asarray(ep), jnp.asarray(ed)))
    results.append(_grade("tied-weight MLP forward",
                          float(np.abs(out_my - out_ref).max()), ok=5e-4))

    # ---------------- 5. integrator parity ----------------
    print("[5] integrator parity")
    Bv, Nv = 8, 96
    rgb = rng.uniform(0, 1, (Bv, Nv, 3)).astype(np.float32)
    sig = np.abs(rng.normal(0, 2, (Bv, Nv))).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, (Bv, Nv)).astype(np.float32), -1)
    rn = rng.uniform(0.8, 1.3, (Bv, 1)).astype(np.float32)
    c_ref, w_ref, a_ref, d_ref = ref_vr(
        torch.from_numpy(rgb), torch.from_numpy(sig), torch.from_numpy(z),
        ray_norm=torch.from_numpy(rn), white_bkgd=True, infinite_last_bin=True)
    c_my, w_my, a_my, d_my = volume_render_rays(
        jnp.asarray(rgb), jnp.asarray(sig), jnp.asarray(z),
        ray_norm=jnp.asarray(rn), white_bkgd=True, infinite_last_bin=True)
    results.append(_grade("integrator rgb", float(np.abs(np.asarray(c_my) - c_ref.numpy()).max())))
    results.append(_grade("integrator weights", float(np.abs(np.asarray(w_my) - w_ref.numpy()).max())))

    # ---------------- 6. end-to-end tied-weight forward ----------------
    print("[6] end-to-end tied-weight forward pass")
    pos_enc = RefEnc(input_dims=3, num_freqs=10, include_input=True)
    dir_enc = RefEnc(input_dims=3, num_freqs=4, include_input=True)
    Bf, Nf = args.rays, 48
    ro = rng.normal(0, 1, (Bf, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (Bf, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, -1, keepdims=True)
    zf = np.sort(rng.uniform(2, 6, (Bf, Nf)).astype(np.float32), -1)
    rnf = rng.uniform(0.9, 1.2, (Bf, 1)).astype(np.float32)
    with torch.no_grad():
        comp_ref, _, acc_ref, _ = ref_fwd(
            rays_o=torch.from_numpy(ro), rays_d_unit=torch.from_numpy(rd),
            z_vals=torch.from_numpy(zf), pos_enc=pos_enc, dir_enc=dir_enc,
            nerf=ref_mlp, white_bkgd=True, ray_norms=torch.from_numpy(rnf),
            viewdirs_world_unit=torch.from_numpy(rd), sigma_activation="relu",
            raw_noise_std=0.0, training=False, infinite_last_bin=True)
    pos_b, dir_b = vanilla_encoders()
    comp_my, _, acc_my, _ = nerf_forward_pass(
        params, cfg, jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(zf),
        pos_bands=jnp.asarray(pos_b), dir_bands=jnp.asarray(dir_b),
        white_bkgd=True, ray_norms=jnp.asarray(rnf),
        viewdirs_world_unit=jnp.asarray(rd), sigma_activation="relu",
        infinite_last_bin=True)
    results.append(_grade("e2e tied-weight rgb",
                          float(np.abs(np.asarray(comp_my) - comp_ref.numpy()).max()),
                          ok=5e-4))
    results.append(_grade("e2e tied-weight acc",
                          float(np.abs(np.asarray(acc_my) - acc_ref.numpy()).max()),
                          ok=5e-4))

    # ---------------- 7. tied-weight FULL-IMAGE render parity ----------------
    # role of compare_nerf_repos.py --do_render: render the same pose with
    # tied weights through BOTH frameworks' full eval pipelines
    # (coarse -> det inverse-CDF fine -> merge -> composite).
    print("[7] tied-weight full-image render parity")
    from nerf_sandbox_tpu.render.renderer import EvalHyper, make_tile_renderer
    from nerf_sandbox_tpu.render.renderer import render_pose as my_render_pose
    from nerf_sandbox.source.utils.render_utils import render_pose as ref_render_pose

    torch.manual_seed(1)
    ref_mlp_f = RefNeRF(enc_pos_dim=63, enc_dir_dim=27, n_layers=8,
                        hidden_dim=256, skip_pos=4)
    params_f = params_from_torch_state_dict(
        {k: v.detach().numpy() for k, v in ref_mlp_f.state_dict().items()}, cfg)
    fr0 = ref_scene.frames[0]
    Hs, Ws = 16, 20
    Ks = np.asarray(fr0.K, np.float32).copy()
    Ks[0] *= Ws / fr0.image.shape[1]
    Ks[1] *= Hs / fr0.image.shape[0]
    with torch.no_grad():
        ref_img = ref_render_pose(
            c2w=np.asarray(fr0.c2w), H=Hs, W=Ws, K=Ks, near=2.0, far=6.0,
            pos_enc=pos_enc, dir_enc=dir_enc, nerf_c=ref_mlp, nerf_f=ref_mlp_f,
            device="cpu", white_bkgd=True, nc_eval=16, nf_eval=16,
            eval_chunk=128, perturb=False, sigma_activation="relu",
            use_ndc=False, convention="opengl", infinite_last_bin=True)
    hyper = EvalHyper(model=cfg, nc_eval=16, nf_eval=16, white_bkgd=True,
                      sigma_activation="relu", infinite_last_bin=True,
                      samp_near=2.0, samp_far=6.0, compute_dtype="float32")
    tile = make_tile_renderer(hyper, jnp.asarray(pos_b), jnp.asarray(dir_b))
    my_img = my_render_pose(tile, params, params_f, np.asarray(fr0.c2w),
                            Hs, Ws, Ks, eval_chunk=128)
    results.append(_grade(
        "full-image tied-weight rgb",
        float(np.abs(my_img["rgb"] - ref_img["rgb"].numpy()).max()), ok=1e-3,
        warn=5e-3))
    results.append(_grade(
        "full-image tied-weight depth",
        float(np.abs(my_img["depth"] - ref_img["depth"].numpy()).max()),
        ok=5e-3, warn=5e-2))

    # ---------------- 8. validation-schedule parity ----------------
    print("[8] validation-schedule parity (fixed + power-law)")
    try:
        from nerf_sandbox.source.utils.validation_schedule import (
            build_validation_steps as ref_sched)
        from nerf_sandbox_tpu.train.schedule import (
            build_validation_steps as my_sched)
        mism, n_cfg = 0.0, 0
        for kw in ({"base_every": 500}, {"base_every": 7},
                   {"num_val_steps": 10},
                   {"num_val_steps": 100, "power": 2.0},
                   {"num_val_steps": 7, "power": 1.0},
                   {"num_val_steps": 9, "power": 3.5},
                   {"num_val_steps": 100000, "power": 2.0}):
            for S in (37, 1000, 50000):
                if ref_sched(S, **kw) != my_sched(S, **kw):
                    mism += 1.0
                n_cfg += 1
        results.append(_grade(f"validation schedule ({n_cfg} configs, "
                              "exact list equality)", mism, ok=0.0))
    except Exception as e:
        print(f"  [FAIL] schedule parity errored: {e}")
        results.append({"name": "validation schedule", "max_abs_diff": 1.0,
                        "status": "FAIL"})

    # ---------------- 9. camera-path pose parity ----------------
    print("[9] camera-path pose parity (blender spherical + llff spiral)")
    try:
        from nerf_sandbox.source.utils.path_pose_generator import (
            PathPoseGenerator as RefGen)
        from nerf_sandbox_tpu.render.path_poses import generate_path_poses
        gen = RefGen()
        rp, rH, rW, rK = gen.generate(ref_scene, 24, path_type="blender",
                                      bl_phi_deg=-25.0, bl_rots=1.5,
                                      bl_theta_start_deg=-170.0,
                                      res_scale=0.5)
        mp, mH, mW, mK = generate_path_poses(my_scene, 24,
                                             path_type="blender",
                                             bl_phi_deg=-25.0, bl_rots=1.5,
                                             bl_theta_start_deg=-170.0,
                                             res_scale=0.5)
        assert (rH, rW) == (mH, mW), f"H/W mismatch {(rH, rW)} vs {(mH, mW)}"
        dpos = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                   for a, b in zip(rp, mp))
        results.append(_grade("blender spherical path poses (24 frames)",
                              max(dpos,
                                  float(np.abs(np.asarray(rK)
                                               - np.asarray(mK)).max())),
                              ok=1e-5))

        if llff_root is None:
            raise RuntimeError("check 1b failed — no LLFF scene to reuse")
        rp, _, _, _ = gen.generate(ref_tr, 12, path_type="llff_spiral",
                                   data_root=llff_root, rots=2.0, zrate=0.5)
        mp, _, _, _ = generate_path_poses(my_tr, 12, path_type="llff_spiral",
                                          data_root=llff_root, rots=2.0,
                                          zrate=0.5)
        dpos = max(float(np.abs(np.asarray(a)[:3] - np.asarray(b)[:3]).max())
                   for a, b in zip(rp, mp))
        results.append(_grade("llff spiral path poses (12 frames)", dpos,
                              ok=1e-4))
    except Exception as e:
        print(f"  [FAIL] path-pose parity errored: {e}")
        results.append({"name": "path poses", "max_abs_diff": 1.0,
                        "status": "FAIL"})

    # ---------------- 10. vanilla-profile parity ----------------
    print("[10] vanilla-profile parity (blender + llff knob-for-knob)")
    try:
        from types import SimpleNamespace
        from nerf_sandbox.source.scripts.train_nerf import (
            apply_vanilla_profile as ref_vanilla, build_argparser as ref_ap)
        from nerf_sandbox_tpu.config import (apply_vanilla_profile,
                                             build_argparser,
                                             make_cfg_from_args)
        # Documented divergences (docs/ROADMAP.md): the reference's profile
        # writes several knobs via getattr(cfg, knob, default) on attributes
        # argparse ALWAYS sets — dead defaults. Its EFFECTIVE blender-vanilla
        # N_rand is therefore 2048 (docstring says 1024) and LLFF-vanilla
        # runs with NO precrop (docstring says 1000@0.5). This repo
        # implements the documented bmild-faithful values.
        known = {("blender", "rays_per_batch"), ("llff", "rays_per_batch"),
                 ("llff", "precrop_iters"), ("llff", "precrop_frac")}
        mism, expected = [], []
        for kind in ("blender", "llff"):
            ref_cfg = SimpleNamespace(**vars(ref_ap().parse_args(
                ["--data_kind", kind, "--data_root", "/x", "--out_dir", "/y",
                 "--vanilla"])))
            ref_vanilla(ref_cfg)
            my_cfg = make_cfg_from_args(build_argparser().parse_args(
                ["--data_kind", kind, "--data_root", "/x", "--out_dir", "/y",
                 "--vanilla"]))
            my_cfg = apply_vanilla_profile(my_cfg)
            for knob in ("use_ndc", "white_bkgd", "sample_from_single_frame",
                         "precrop_iters", "precrop_frac", "pos_num_freqs",
                         "dir_num_freqs", "n_layers", "hidden_dim",
                         "skip_pos", "nc", "nf", "rays_per_batch",
                         "raw_noise_std", "lr", "infinite_last_bin",
                         "sigma_activation"):
                rv, mv = getattr(ref_cfg, knob), getattr(my_cfg, knob)
                if rv != mv:
                    (expected if (kind, knob) in known else mism).append(
                        f"{kind}.{knob}: ref={rv} mine={mv}")
        if expected:
            print(f"         documented divergences (reference dead-getattr "
                  f"profile lines): {expected}")
        if mism:
            print(f"         UNEXPECTED mismatches: {mism}")
        results.append(_grade("vanilla profile (2 kinds x 17 knobs, 4 "
                              "documented divergences)",
                              float(len(mism)), ok=0.0))
    except Exception as e:
        print(f"  [FAIL] vanilla-profile parity errored: {e}")
        results.append({"name": "vanilla profile", "max_abs_diff": 1.0,
                        "status": "FAIL"})

    # ---------------- report ----------------
    n_fail = sum(r["status"] == "FAIL" for r in results)
    n_warn = sum(r["status"] == "WARN" for r in results)
    verdict = "FAIL" if n_fail else ("WARN" if n_warn else "OK")
    report = {"verdict": verdict, "n_ok": len(results) - n_fail - n_warn,
              "n_warn": n_warn, "n_fail": n_fail, "checks": results}
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(f"\n== parity verdict: {verdict} "
          f"({report['n_ok']} OK / {n_warn} WARN / {n_fail} FAIL) "
          f"→ {args.out}")
    return 0 if verdict != "FAIL" else 1


if __name__ == "__main__":
    raise SystemExit(main())
