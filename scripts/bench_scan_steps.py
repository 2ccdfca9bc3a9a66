"""`--scan_steps` dispatch-amortization sweep (VERDICT r3 #7).

Times the REAL fused train step (vanilla shapes: B=1024, nc64+nf128,
8x256 bf16 MLP) at scan_steps in {1, 4, 16}, normalizing to wall-clock
per OPTIMIZER step including dispatch gaps — the quantity the trainer's
hot loop actually pays (step.py's scan wrapper exists precisely to
amortize per-dispatch runtime overhead).

Honesty notes (CLAUDE.md): each dispatch is barriered by a float()
scalar pull; every config advances the same number of optimizer steps.
Through the axon tunnel the per-dispatch latency is INFLATED vs a local
TPU runtime, so the scan=1 row is an upper bound on dispatch cost —
the decision threshold below accounts for that.

Prints one JSON line per config plus a `decision` line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RAYS = 1024
NC, NF = 64, 128
TOTAL_STEPS = 192          # per config; divisible by 1, 4, 16


def main():
    import jax
    import jax.numpy as jnp

    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.data.scene import Frame, Scene
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)

    H = W = 800
    rng = np.random.RandomState(0)
    K = np.array([[1111.1, 0, W / 2], [0, 1111.1, H / 2], [0, 0, 1]],
                 np.float32)
    frames = []
    for i in range(4):
        th = i * np.pi / 6
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                                [-np.sin(th), 0, np.cos(th)]], np.float32)
        c2w[:3, 3] = c2w[:3, :3] @ np.array([0, 0, 4.0], np.float32)
        frames.append(Frame(
            image=rng.randint(0, 255, (H, W, 4), np.uint8), K=K, c2w=c2w))
    scene = SceneArrays.from_scene(Scene(frames=frames, white_bkgd=True))

    model = NeRFConfig(enc_pos_dim=63, enc_dir_dim=27, n_layers=8,
                       hidden_dim=256, skip_pos=4)
    hyper = TrainHyper(model=model, nc=NC, nf=NF, raw_noise_std=1.0,
                       sigma_activation="relu", white_bkgd=True,
                       infinite_last_bin=True, samp_near=2.0, samp_far=6.0)
    spec = RayBatchSpec(rays_per_batch=RAYS, image_h=H, image_w=W,
                        white_bkgd=True)
    pos_b, dir_b = vanilla_encoders()
    tx = make_optimizer(5e-4, "cosine", {"T_max": 50_000, "eta_min": 5e-6})

    rows = []
    for scan in (1, 4, 16):
        step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                                   jnp.asarray(dir_b), scan_steps=scan)
        state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                                 near=2.0, far=6.0)
        n_disp = TOTAL_STEPS // scan
        # warm-up: compile + one real dispatch
        state, m = step_fn(state, scene)
        _ = float(m["loss"])
        t0 = time.time()
        for _ in range(n_disp):
            state, m = step_fn(state, scene)
            _ = float(m["loss"])          # barrier per dispatch
        dt = time.time() - t0
        ms = dt / TOTAL_STEPS * 1e3
        rows.append({"scan_steps": scan, "ms_per_opt_step": round(ms, 3),
                     "dispatches": n_disp, "wall_s": round(dt, 2)})
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]["ms_per_opt_step"]
    best = min(rows, key=lambda r: r["ms_per_opt_step"])
    print(json.dumps({
        "decision": {
            "best_scan": best["scan_steps"],
            "speedup_vs_scan1": round(base / best["ms_per_opt_step"], 3),
            "note": "tunnel inflates scan=1 dispatch cost vs local runtime",
        }}))


if __name__ == "__main__":
    main()
