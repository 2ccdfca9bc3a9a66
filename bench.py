"""Benchmark: vanilla-NeRF training-step throughput on the local chip.

Measures the REAL hot path — the fused jitted train step (in-jit ray
sampling, coarse 64 + fine 128 forwards, inverse-CDF resampling, MSE loss,
Adam update) on the vanilla Lego recipe shapes (1024 rays/step, 8x256 MLP,
bf16 matmuls) — and reports ray-samples/sec/chip against the driver target
of 5M (BASELINE.md).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RAY_SAMPLES_PER_SEC = 5e6   # /root/repo/BASELINE.json north star
RAYS_PER_BATCH = 1024
NC, NF = 64, 128
SCAN_STEPS = 20                      # trainer's --scan_steps fused chunks
WARMUP_CALLS = 3
BENCH_CALLS = 15                     # x SCAN_STEPS optimizer steps


def main():
    import jax
    import jax.numpy as jnp

    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.data.scene import Frame, Scene
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.parallel.mesh import make_mesh
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)

    # synthetic scene with lego-like geometry (images are gather-only; the
    # compute cost is set by rays x samples x MLP, not by image content)
    H = W = 800
    rng = np.random.RandomState(0)
    K = np.array([[1111.1, 0, W / 2], [0, 1111.1, H / 2], [0, 0, 1]], np.float32)
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
    spec = RayBatchSpec(rays_per_batch=RAYS_PER_BATCH, image_h=H, image_w=W,
                        white_bkgd=True)
    tx = make_optimizer(5e-4, "cosine", {"T_max": 50_000, "eta_min": 5e-6})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0, far=6.0)
    pos_b, dir_b = vanilla_encoders()
    plan = make_mesh()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b), plan=plan,
                               scan_steps=SCAN_STEPS)

    for _ in range(WARMUP_CALLS):
        state, metrics = step_fn(state, scene)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(BENCH_CALLS):
        state, metrics = step_fn(state, scene)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    n_chips = max(1, plan.n_devices)
    rays_per_sec = BENCH_CALLS * SCAN_STEPS * RAYS_PER_BATCH / dt
    samples_per_ray = NC + (NC + NF)      # coarse pass + merged fine pass
    ray_samples_per_sec = rays_per_sec * samples_per_ray / n_chips

    print(json.dumps({
        "metric": "train_ray_samples_per_sec_per_chip",
        "value": round(ray_samples_per_sec, 1),
        "unit": "ray-samples/s/chip (vanilla 64+192 train step, fwd+bwd+adam)",
        "vs_baseline": round(ray_samples_per_sec / BASELINE_RAY_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:          # the remote-compile tunnel can flake;
        import sys, traceback       # one retry rescues the round's datapoint
        traceback.print_exc()
        print("bench: first attempt failed; retrying once...", file=sys.stderr)
        main()
