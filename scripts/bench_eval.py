"""Eval-throughput bench: 800x800 frame renders across eval-path variants.

Measures the reference ``render_image_chunked`` role
(``render_utils.py:285-417``) on TPU: XLA vs fused Pallas ray-march, fine
-ray culling (--eval_fine_frac), early ray termination (--eval_ert_eps),
and occupancy-mode eval.  Uses a TRAINED checkpoint (opacity distribution
drives culling/ERT, so random params would lie).

Tunnel honesty: a frame is ONE jitted fori_loop over all of its tiles
with outputs chained into the next tile's origins (single dispatch — the
tunnel's per-call latency jitter and repeat-execution fabrication cannot
skew it); the execution barrier is a float() scalar pull, and reps use
distinct inputs.

Usage:
  python scripts/bench_eval.py --ckpt_dir /tmp/bench_ckpt --data_root /tmp/spheres_v
  (trains 3k vanilla steps into --ckpt_dir first if it has no checkpoint;
   add --occ_dir for an occupancy-mode checkpoint to bench that variant)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _trainer_for(data_root, out_dir, extra=()):
    from nerf_sandbox_tpu.scripts.train_nerf import main as cli_main
    argv = ["--data_root", data_root, "--out_dir", out_dir, "--vanilla",
            "--max_steps", "3000", "--val_every", "100000",
            "--ckpt_every", "1000", "--log_every", "1000", *extra]
    cli_main(argv)


def _load(data_root, out_dir, extra=(), vanilla=True, use_saved=False):
    """``vanilla=False`` skips the profile (it force-overrides model-shape
    flags like --n_layers/--hidden_dim — wrong for non-vanilla runs such
    as the small-MLP kplanes recipe).  ``use_saved=True`` restores the
    run's trained flags from its checkpoint's config echo (same mechanism
    as the eval CLI) so non-vanilla runs need no flag pass-through;
    ``extra`` still overrides."""
    from nerf_sandbox_tpu.config import (apply_path_defaults,
                                         apply_vanilla_profile,
                                         build_argparser, make_cfg_from_args)
    from nerf_sandbox_tpu.train.trainer import Trainer
    argv = ["--data_root", data_root, "--out_dir", out_dir,
            *(["--vanilla"] if vanilla else []), *extra]
    ap = build_argparser()
    if use_saved:
        from nerf_sandbox_tpu.train import checkpoints as ckpt
        peek = ckpt.peek_checkpoint_meta(out_dir)
        if peek is not None:
            _, saved = peek
            dests = {a.dest for a in ap._actions}
            ap.set_defaults(**{k: v for k, v in saved.items()
                               if k in dests and k not in
                               ("data_root", "out_dir", "resume",
                                "val_split")})
            print(f"[bench_eval] restored saved config from {out_dir}")
    cfg = make_cfg_from_args(ap.parse_args(argv))
    cfg.data_kind = "blender"
    if cfg.centering is None:
        cfg.centering = "none"
    if vanilla:
        cfg = apply_vanilla_profile(cfg)
    cfg = apply_path_defaults(cfg, "blender")
    tr = Trainer(cfg)
    step = tr.load_latest_checkpoint(load_optim=False)
    print(f"[bench_eval] restored step {step} from {out_dir}")
    return tr


def _poses(n, radius=4.0):
    """n distinct look-at-origin poses on a circle (distinct args per rep)."""
    out = []
    for i in range(n):
        th = 2 * np.pi * (i + 1) / (n + 3)
        eye = np.array([radius * np.sin(th), 0.6, radius * np.cos(th)])
        fwd = eye / np.linalg.norm(eye)                 # +z back toward eye
        right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, eye
        out.append(c2w)
    return out


def _bench_variant(tr, hyper, label, H=800, W=800, eval_chunk=32768,
                   n_reps=3, radius=4.0):
    """Per-frame DEVICE time via a dependent chain: ONE jitted fori_loop
    renders every tile of a real 800x800 frame (outputs chained into the
    next tile's origins), so a frame is a single dispatch and the axon
    tunnel's per-call latency / repeat-execution fabrication can't skew
    the numbers (CLAUDE.md methodology).  The barrier is a float() pull."""
    import jax
    import jax.numpy as jnp
    from nerf_sandbox_tpu.core.rays import get_camera_rays_grid
    from nerf_sandbox_tpu.render.renderer import make_tile_renderer
    tile_fn = make_tile_renderer(hyper, tr.pos_bands, tr.dir_bands,
                                 plan=tr.plan)
    K = np.array([[0.5 * W / np.tan(0.3), 0, W / 2],
                  [0, 0.5 * W / np.tan(0.3), H / 2], [0, 0, 1]], np.float32)
    pc, pf = tr.eval_params()
    c2w = _poses(1, radius=radius)[0]
    rays = get_camera_rays_grid(jnp.asarray(K), jnp.asarray(c2w),
                                image_h=H, image_w=W, convention="opengl",
                                pixel_center=True)
    n = H * W
    tile = int(eval_chunk)
    n_pad = (-n) % tile
    n_tiles = (n + n_pad) // tile

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((n_pad,) + x.shape[1:], fill, x.dtype)]) \
            if n_pad else x

    ro = pad(rays.o_march)
    rd = pad(rays.d_march_unit)
    rn = pad(rays.d_march_norm.reshape(n, 1), 1.0)
    vd = pad(rays.d_world_unit)
    ra = None
    if getattr(hyper, "ipe", False):
        from nerf_sandbox_tpu.core.encoding import pixel_cone_radii
        ra = pad(pixel_cone_radii(
            float(K[0, 0]), rays.d_world_norm).reshape(n, 1), 1e-3)
    if n_pad:   # zero dirs are degenerate; padded rays march +z
        rd = rd.at[n:].set(jnp.array([0.0, 0.0, 1.0]))
        vd = vd.at[n:].set(jnp.array([0.0, 0.0, 1.0]))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def frame(ro_all):
        def body(t, carry):
            eps, acc_sum = carry
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, t * tile, tile)
            rgb, acc, _ = tile_fn(pc, pf, sl(ro_all) + eps, sl(rd),
                                  sl(rn), sl(vd), key,
                                  sl(ra) if ra is not None else None)
            return (jnp.float32(1e-30) * rgb.sum(), acc_sum + acc.sum())
        _, acc_sum = jax.lax.fori_loop(
            0, n_tiles, body, (jnp.float32(0.0), jnp.float32(0.0)))
        return acc_sum

    float(frame(ro))                                    # warm-up / compile
    times = []
    acc_last = 0.0
    for r in range(n_reps):
        ro_r = ro + jnp.float32(1e-6 * (r + 1))         # distinct args
        t0 = time.time()
        acc_last = float(frame(ro_r))                   # float() = barrier
        times.append(time.time() - t0)
    dt = min(times)
    rays_s = n / dt
    print(f"  {label:42s} {dt:6.2f} s/frame  {rays_s/1e3:7.0f}k rays/s  "
          f"(mean acc {acc_last/n:.3f}, reps {['%.2f' % t for t in times]})")
    return {"label": label, "s_per_frame": dt, "rays_per_s": rays_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="/tmp/spheres_v")
    ap.add_argument("--ckpt_dir", default="/tmp/bench_eval_ckpt")
    ap.add_argument("--occ_dir", default=None,
                    help="out_dir of an occupancy-mode run to bench")
    ap.add_argument("--kp_dir", default=None,
                    help="out_dir of a kplanes+occupancy run to bench")
    ap.add_argument("--occ_extra", default="",
                    help="extra trainer flags for the occupancy run (e.g. "
                         "'--occ_aabb_scale 2.5' to match its training box)")
    ap.add_argument("--kp_extra", default="",
                    help="extra trainer flags for the kplanes run (e.g. "
                         "'--n_layers 3 --hidden_dim 64 --skip_pos 1' for "
                         "the fast-family small-MLP recipe)")
    ap.add_argument("--data360", default="/tmp/u360",
                    help="data_root of the --dir360 run's scene")
    ap.add_argument("--dir360", default=None,
                    help="out_dir of an unbounded-360 run (contraction; "
                         "e.g. the kplanes-hybrid winner) — benches its "
                         "XLA vs fused eval (round 4: contraction and the "
                         "kplanes/hybrid encode are in-kernel)")
    ap.add_argument("--extra360", default="",
                    help="trainer flags matching the --dir360 run's recipe")
    ap.add_argument("--ipe_dir", default=None,
                    help="out_dir of an --ipe run (bounded quality leader) "
                         "— benches XLA-IPE vs the round-5 in-kernel IPE")
    ap.add_argument("--skip_hier", action="store_true",
                    help="skip the hierarchical variants")
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()

    if not args.skip_hier and \
            not list(Path(args.ckpt_dir).glob("checkpoints/*")):
        print("[bench_eval] no checkpoint — training 3k vanilla steps first")
        _trainer_for(args.data_root, args.ckpt_dir)

    results = []
    if not args.skip_hier:
        tr = _load(args.data_root, args.ckpt_dir)
        h = tr.eval_hyper._replace(sampling_mode="hierarchical", nf_eval=192)
    for hyper, label in [] if args.skip_hier else [
        (h._replace(use_pallas=False, eval_fine_frac=1.0, eval_ert_eps=0.0),
         "XLA, refine-all"),
        (h._replace(use_pallas=True, eval_fine_frac=1.0, eval_ert_eps=0.0),
         "fused kernel, refine-all"),
        (h._replace(use_pallas=True, eval_fine_frac=1.0, eval_ert_eps=1e-4),
         "fused kernel + ERT"),
        (h._replace(use_pallas=True, eval_fine_frac=0.5, eval_ert_eps=0.0),
         "fused kernel + cull 0.5"),
        (h._replace(use_pallas=True, eval_fine_frac=0.5, eval_ert_eps=1e-4),
         "fused kernel + cull 0.5 + ERT (fast recipe)"),
    ]:
        results.append(_bench_variant(tr, hyper, label, n_reps=args.frames))

    if args.occ_dir:
        tro = _load(args.data_root, args.occ_dir,
                    extra=["--sampling", "occupancy",
                           *args.occ_extra.split()])
        ho = tro.eval_hyper
        for hyper, label in [
            (ho._replace(use_pallas=True, eval_ert_eps=0.0),
             "occupancy eval (128 samples), fused"),
            (ho._replace(use_pallas=True, eval_ert_eps=1e-4),
             "occupancy eval + ERT"),
            (ho._replace(use_pallas=True, eval_ert_eps=1e-4,
                         eval_fine_frac=0.5),
             "occupancy eval + ERT + cull 0.5"),
        ]:
            results.append(_bench_variant(tro, hyper, label,
                                          n_reps=args.frames))

    if args.kp_dir:
        kp_extra = args.kp_extra.split()
        trk = _load(args.data_root, args.kp_dir,
                    extra=["--sampling", "occupancy", "--encoder", "kplanes",
                           *kp_extra], vanilla=False, use_saved=True)
        hk = trk.eval_hyper._replace(use_pallas=False)  # XLA (kplanes enc)
        results.append(_bench_variant(
            trk, hk, "kplanes+occupancy eval (XLA)",
            n_reps=args.frames))
        results.append(_bench_variant(
            trk, hk._replace(eval_fine_frac=0.5),
            "kplanes+occupancy eval + cull 0.5",
            n_reps=args.frames))
        # round-4: the kplanes encode is fused in-kernel (one-hot matmul
        # bilinear interps on VMEM-resident tables)
        hkf = trk.eval_hyper._replace(use_pallas=True)
        results.append(_bench_variant(
            trk, hkf, "kplanes+occupancy eval (fused kernel)",
            n_reps=args.frames))
        results.append(_bench_variant(
            trk, hkf._replace(eval_ert_eps=1e-4, eval_fine_frac=0.5),
            "kplanes+occupancy fused + ERT + cull 0.5",
            n_reps=args.frames))
        # eval-only plane pooling (--eval_kp_pool): 4x encode-FLOP cut per
        # factor 2 (the 2QR^2F plane contraction dominates this family's
        # eval cost — VERDICT r2 #4)
        for pool in (2, 4):
            trp = _load(args.data_root, args.kp_dir,
                        extra=["--sampling", "occupancy",
                               "--encoder", "kplanes", *kp_extra,
                               "--eval_kp_pool", str(pool)],
                        vanilla=False, use_saved=True)
            results.append(_bench_variant(
                trp, trp.eval_hyper._replace(use_pallas=False),
                f"kplanes+occupancy eval, planes pooled {pool}x",
                n_reps=args.frames))

    if args.ipe_dir:
        tri = _load(args.data_root, args.ipe_dir, vanilla=False,
                    use_saved=True)
        hi = tri.eval_hyper
        assert hi.ipe, f"{args.ipe_dir} was not trained with --ipe"
        for hyper, label in [
            (hi._replace(use_pallas=False), "IPE eval (XLA)"),
            (hi._replace(use_pallas=True), "IPE eval (fused kernel)"),
            (hi._replace(use_pallas=True, eval_ert_eps=1e-4,
                         eval_fine_frac=0.5),
             "IPE fused + ERT + cull 0.5"),
        ]:
            results.append(_bench_variant(tri, hyper, label,
                                          n_reps=args.frames))

    if args.dir360:
        tr3 = _load(args.data360, args.dir360,
                    extra=args.extra360.split(), vanilla=False,
                    use_saved=True)
        h3 = tr3.eval_hyper
        # camera at the run's (normalized) orbit radius — a mip-360 rig
        # sits inside the unit ball, and the occupancy cull seen from a
        # far-outside pose would flatter the numbers
        r360 = float(np.linalg.norm(
            np.asarray(tr3.scene_val.frames[0].c2w)[:3, 3]))
        for hyper, label in [
            (h3._replace(use_pallas=False), "unbounded-360 eval (XLA)"),
            (h3._replace(use_pallas=True),
             "unbounded-360 eval (fused kernel)"),
            (h3._replace(use_pallas=True, eval_ert_eps=1e-4,
                         eval_fine_frac=0.5),
             "unbounded-360 fused + ERT + cull 0.5"),
        ]:
            results.append(_bench_variant(tr3, hyper, label,
                                          n_reps=args.frames,
                                          radius=r360))

    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
