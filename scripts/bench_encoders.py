"""Encoder-family train-step benchmark on the local TPU chip.

Measures the fused train step (sampling + forwards + resample + loss +
Adam) at vanilla shapes (1024 rays, 64+192 hierarchical samples) for each
position-encoder family, using bench.py's honest timing pattern (state
threaded call-to-call so the axon tunnel cannot replay; scan_steps fusion).

    python scripts/bench_encoders.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RAYS, NC, NF = 1024, 64, 128
SCAN, CALLS = 10, 8


def bench(name, pos_encoder, enc_cfg, n_layers, hidden, skip,
          enc_pos_dim, sampling="hierarchical") -> float:
    import jax
    import jax.numpy as jnp

    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.data.scene import Frame, Scene
    from nerf_sandbox_tpu.models.mlp import NeRFConfig
    from nerf_sandbox_tpu.parallel.mesh import make_mesh
    from nerf_sandbox_tpu.train.step import (
        TrainHyper, build_train_step, init_train_state, make_optimizer)

    H = W = 256
    rng = np.random.RandomState(0)
    K = np.array([[355.5, 0, W / 2], [0, 355.5, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 0, 4.0]
    scene = SceneArrays.from_scene(Scene(frames=[
        Frame(image=rng.randint(0, 255, (H, W, 4), np.uint8), K=K, c2w=c2w)],
        white_bkgd=True))

    model = NeRFConfig(enc_pos_dim=enc_pos_dim, enc_dir_dim=27,
                       n_layers=n_layers, hidden_dim=hidden, skip_pos=skip)
    occ_cfg = None
    if sampling == "occupancy":
        from nerf_sandbox_tpu.models.occupancy import OccupancyConfig
        occ_cfg = OccupancyConfig(resolution=64, lo=(-1.5,) * 3,
                                  hi=(1.5,) * 3)
    hyper = TrainHyper(model=model, nc=NC, nf=NF, raw_noise_std=1.0,
                       white_bkgd=True, infinite_last_bin=True,
                       samp_near=2.0, samp_far=6.0,
                       pos_encoder=pos_encoder, enc_cfg=enc_cfg,
                       sampling_mode=sampling, occ_cfg=occ_cfg)
    spec = RayBatchSpec(rays_per_batch=RAYS, image_h=H, image_w=W,
                        white_bkgd=True)
    tx = make_optimizer(5e-4, "cosine", {"T_max": 50_000, "eta_min": 5e-6})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=2.0, far=6.0)
    pos_b, dir_b = vanilla_encoders()
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b), plan=make_mesh(),
                               scan_steps=SCAN)

    occ_args = ()
    if sampling == "occupancy":
        from nerf_sandbox_tpu.models.occupancy import init_occupancy_grid
        occ_args = (init_occupancy_grid(occ_cfg),)

    for _ in range(2):
        state, metrics = step_fn(state, scene, *occ_args)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(CALLS):
        state, metrics = step_fn(state, scene, *occ_args)
    _ = float(metrics["loss"])
    ms = (time.perf_counter() - t0) / (CALLS * SCAN) * 1e3
    samples = NF if sampling == "occupancy" else NC + NC + NF
    rs = RAYS * samples / (ms / 1e3)
    print(f"{name:44s}: {ms:7.2f} ms/step  ({rs/1e6:6.1f}M ray-samples/s)")
    return ms


def main():
    from nerf_sandbox_tpu.models.hashgrid import HashGridConfig
    from nerf_sandbox_tpu.models.kplanes import KPlanesConfig

    bench("positional 8x256 (vanilla reference)", "freq", None, 8, 256, 4, 63)
    kp = KPlanesConfig()
    bench(f"kplanes{kp.plane_res}xF{kp.plane_features} + 8x256", "kplanes",
          kp, 8, 256, 4, kp.out_dim)
    bench(f"kplanes{kp.plane_res}xF{kp.plane_features} + 3x64 (natural)",
          "kplanes", kp, 3, 64, 1, kp.out_dim)
    bench("positional 8x256 + occupancy", "freq", None, 8, 256, 4, 63,
          sampling="occupancy")
    bench(f"kplanes + 3x64 + occupancy (fast mode)", "kplanes",
          kp, 3, 64, 1, kp.out_dim, sampling="occupancy")
    hg = HashGridConfig(n_levels=12, n_features=2, log2_table_size=17,
                        base_res=16, max_res=512, aabb_scale=1.5)
    bench("hashgrid 12x2^17 + 3x64", "hashgrid", hg, 3, 64, 1, hg.out_dim)


if __name__ == "__main__":
    main()
