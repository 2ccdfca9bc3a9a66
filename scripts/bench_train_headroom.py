"""SURVEY §7 stage 8 disposition measurement: how much could a fused
Pallas TRAIN-path kernel possibly buy?

The train step = coarse forward (B x nc) + fine forward (B x (nc+nf)) +
backward (~2x forward FLOPs) + sampling/loss/Adam. The only part a fused
train kernel could accelerate is the MLP forward/backward chain; XLA is
measured at the bf16 matmul ceiling there (CLAUDE.md: ~70 TFLOP/s on
(.,256)x(256,256) chains). This bench pins the claim with numbers from
THIS code: it times (a) the full train step, (b) the XLA MLP
forward-only at the step's exact shapes, (c) the Pallas fused MLP forward
(ops/fused_mlp.py) at the same shapes, and reports the step-level upper
bound of replacing XLA with the kernel for fwd+bwd:

    headroom <= 3 * (xla_fwd - pallas_fwd) / step_time

(3x: backward of a matmul chain is ~2 forward-equivalents; if the fused
forward is no faster, a fused backward won't be either.)

Timing: chained fori_loop per variant (axon-tunnel-honest), float() pull
as the barrier. Run as the only JAX process:
    python scripts/bench_train_headroom.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, NC, NF = 1024, 64, 128
ITERS = 200


def main():
    import jax
    import jax.numpy as jnp
    from nerf_sandbox_tpu.core.encoding import vanilla_encoders
    from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
    from nerf_sandbox_tpu.data.scene import Frame, Scene
    from nerf_sandbox_tpu.models.mlp import (NeRFConfig, init_nerf_params,
                                             nerf_apply)
    from nerf_sandbox_tpu.ops.fused_mlp import fused_nerf_apply
    from nerf_sandbox_tpu.train.step import (TrainHyper, build_train_step,
                                             init_train_state, make_optimizer)
    from nerf_sandbox_tpu.parallel.mesh import make_mesh

    model = NeRFConfig(63, 27, n_layers=8, hidden_dim=256, skip_pos=4)
    pos_b, dir_b = vanilla_encoders()

    # ---- (a) full train step (scan_steps chained => honest device time)
    H = W = 256
    rng = np.random.RandomState(0)
    K = np.array([[355.5, 0, W / 2], [0, 355.5, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 0, 4.0]
    scene = SceneArrays.from_scene(Scene(frames=[Frame(
        image=rng.randint(0, 255, (H, W, 4), np.uint8), K=K, c2w=c2w)],
        white_bkgd=True))
    hyper = TrainHyper(model=model, nc=NC, nf=NF, raw_noise_std=1.0,
                       white_bkgd=True, infinite_last_bin=True,
                       samp_near=2.0, samp_far=6.0)
    spec = RayBatchSpec(rays_per_batch=B, image_h=H, image_w=W,
                        white_bkgd=True)
    tx = make_optimizer(5e-4, "none", {})
    state = init_train_state(jax.random.PRNGKey(0), hyper, tx,
                             near=2.0, far=6.0)
    SCAN = 20
    step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                               jnp.asarray(dir_b), plan=make_mesh(),
                               scan_steps=SCAN)
    state, m = step_fn(state, scene)          # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(5):
        state, m = step_fn(state, scene)
    float(m["loss"])
    step_ms = 1e3 * (time.perf_counter() - t0) / (5 * SCAN)

    # ---- (b)/(c) MLP forward at the step's shapes: Q = B*nc + B*(nc+nf)
    Q = B * NC + B * (NC + NF)
    kp = jax.random.PRNGKey(1)
    ep = jax.random.normal(kp, (Q, 63), jnp.float32)
    ed = jax.random.normal(jax.random.fold_in(kp, 1), (Q, 27), jnp.float32)
    params = init_nerf_params(jax.random.PRNGKey(2), model)

    def timed(fn):
        @jax.jit
        def loop(eps0):
            def body(_, eps):
                out = fn(ep + eps)
                # chain: feed a scalar of the output back into the input
                return jnp.float32(1e-12) * out.sum()
            return jax.lax.fori_loop(0, ITERS, body, eps0)
        float(loop(jnp.float32(0.0)))          # compile+warm
        t0 = time.perf_counter()
        float(loop(jnp.float32(1e-6)))
        return 1e3 * (time.perf_counter() - t0) / ITERS

    xla_ms = timed(lambda e: nerf_apply(
        params, model, e, ed, compute_dtype=jnp.bfloat16))
    pallas_ms = timed(lambda e: fused_nerf_apply(params, model, e, ed))

    headroom = 3.0 * max(0.0, xla_ms - pallas_ms) / step_ms
    print(json.dumps({
        "train_step_ms": round(step_ms, 3),
        "xla_mlp_fwd_ms": round(xla_ms, 3),
        "pallas_mlp_fwd_ms": round(pallas_ms, 3),
        "fused_train_path_headroom_upper_bound": round(headroom, 4),
        "note": "headroom <= 3*(xla_fwd - pallas_fwd)/step over the full "
                "step; <=0 means a fused train kernel cannot beat XLA here",
    }))


if __name__ == "__main__":
    sys.exit(main())
