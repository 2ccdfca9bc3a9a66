"""VERDICT r2 #6: attack (don't clamp) the B=4096 libtpu regalloc bug.

A direct B=4096 vanilla train-step compile once died in libtpu register
allocation (RET_CHECK, CLAUDE.md). This measures whether in-step
``micro_chunks`` gradient accumulation (``lax.scan`` over 4x1024 slices
inside ONE program, step.py loss_fn) dodges the bug, and what each
surviving variant's throughput is vs the B=1024 baseline.

Variants: (B, micro_chunks) in (1024,0) (2048,0) (2048,2) (4096,0)
(4096,4). Each compiles in a FRESH subprocess so a libtpu crash in one
variant cannot take down the rest. Prints a JSON line per variant.

Run (only JAX process): python scripts/bench_b4096.py
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

CHILD = r"""
import json, time, sys
import numpy as np
import jax, jax.numpy as jnp
from nerf_sandbox_tpu.core.encoding import vanilla_encoders
from nerf_sandbox_tpu.data.sampler import RayBatchSpec, SceneArrays
from nerf_sandbox_tpu.data.scene import Frame, Scene
from nerf_sandbox_tpu.models.mlp import NeRFConfig
from nerf_sandbox_tpu.parallel.mesh import make_mesh
from nerf_sandbox_tpu.train.step import (TrainHyper, build_train_step,
                                         init_train_state, make_optimizer)

B = int(sys.argv[1]); MC = int(sys.argv[2])
NC, NF, SCAN, CALLS = 64, 128, 10, 8
H = W = 800
rng = np.random.RandomState(0)
K = np.array([[1111.1, 0, W/2], [0, 1111.1, H/2], [0, 0, 1]], np.float32)
c2w = np.eye(4, dtype=np.float32); c2w[:3, 3] = [0, 0, 4.0]
scene = SceneArrays.from_scene(Scene(frames=[Frame(
    image=rng.randint(0, 255, (H, W, 4), np.uint8), K=K, c2w=c2w)],
    white_bkgd=True))
model = NeRFConfig(63, 27, n_layers=8, hidden_dim=256, skip_pos=4)
hyper = TrainHyper(model=model, nc=NC, nf=NF, raw_noise_std=1.0,
                   white_bkgd=True, infinite_last_bin=True,
                   samp_near=2.0, samp_far=6.0, micro_chunks=MC)
spec = RayBatchSpec(rays_per_batch=B, image_h=H, image_w=W, white_bkgd=True)
tx = make_optimizer(5e-4, "cosine", {"T_max": 50_000, "eta_min": 5e-6})
state = init_train_state(jax.random.PRNGKey(0), hyper, tx, near=2.0, far=6.0)
pos_b, dir_b = vanilla_encoders()
step_fn = build_train_step(hyper, spec, tx, jnp.asarray(pos_b),
                           jnp.asarray(dir_b), plan=make_mesh(),
                           scan_steps=SCAN)
t0 = time.perf_counter()
state, m = step_fn(state, scene)
jax.block_until_ready(m["loss"])
compile_s = time.perf_counter() - t0
for _ in range(2):
    state, m = step_fn(state, scene)
jax.block_until_ready(m["loss"])
t0 = time.perf_counter()
for _ in range(CALLS):
    state, m = step_fn(state, scene)
jax.block_until_ready(m["loss"])
dt = time.perf_counter() - t0
rs = CALLS * SCAN * B * (NC + NC + NF) / dt
print("RESULT " + json.dumps({
    "B": B, "micro_chunks": MC, "compile_s": round(compile_s, 1),
    "ms_per_step": round(1e3 * dt / (CALLS * SCAN), 3),
    "ray_samples_per_sec": round(rs, 1)}))
"""


def main():
    root = Path(__file__).resolve().parent.parent
    results = []
    for B, MC in [(1024, 0), (2048, 0), (2048, 2), (4096, 0), (4096, 4),
                  (8192, 8)]:
        print(f"[bench_b4096] B={B} micro_chunks={MC} ...", flush=True)
        p = subprocess.run([sys.executable, "-c", CHILD, str(B), str(MC)],
                           cwd=root, capture_output=True, text=True,
                           timeout=1200)
        line = next((l for l in p.stdout.splitlines()
                     if l.startswith("RESULT ")), None)
        if line:
            r = json.loads(line[len("RESULT "):])
            r["status"] = "ok"
        else:
            tail = (p.stderr or p.stdout).strip().splitlines()[-8:]
            r = {"B": B, "micro_chunks": MC, "status": "FAILED",
                 "tail": tail}
        print(json.dumps(r), flush=True)
        results.append(r)
    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
