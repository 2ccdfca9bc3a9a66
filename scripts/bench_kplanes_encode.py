"""Where does kplanes EVAL encode time go? (VERDICT r2 #4 follow-up.)

The plane contraction is 2QR^2F FLOPs; at eval's ~82M samples/frame and
R=(64,128), F=8 that is ~80 TFLOP/frame — ~1.1 s at the 70 TFLOP/s v5e
matmul ceiling. Measured eval is ~3.8 s/frame, i.e. ~2.5x off roofline.
Candidate causes: the (chunk, R, F) matmul intermediate spilling to HBM
at chunk=32768 (64 MB bf16 per plane), and the one-hot weight build.

This sweeps the encode in isolation at Q=1M:
  * chunk in {2048, 8192, 32768}
  * weight build: one-hot blend (current) vs closed-form hat
    relu(1 - |u(R-1) - i|) (same numerics, one fused VPU expression)

Chained fori_loop timing (axon-honest), float() barrier. Run alone:
    python scripts/bench_kplanes_encode.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

Q = 1 << 20
ITERS = 30


def main():
    import jax
    import jax.numpy as jnp
    from nerf_sandbox_tpu.models.kplanes import (KPlanesConfig,
                                                 init_kplanes_params,
                                                 kplanes_encode)

    base = KPlanesConfig()
    params = init_kplanes_params(jax.random.PRNGKey(0), base)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (Q, 3),
                             minval=-1.4, maxval=1.4)

    def timed(cfg):
        @jax.jit
        def loop(p):
            def body(_, carry):
                out = kplanes_encode(params, p + carry, cfg)
                return jnp.float32(1e-12) * out.sum()
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        float(loop(pts))
        t0 = time.perf_counter()
        float(loop(pts + jnp.float32(1e-6)))
        dt = (time.perf_counter() - t0) / ITERS
        return dt

    results = []
    for chunk in (2048, 8192, 32768):
        cfg = base._replace(chunk=chunk)
        dt = timed(cfg)
        r = {"chunk": chunk, "ms_per_1M_pts": round(1e3 * dt, 2),
             "s_per_frame_at_82M": round(dt * 82, 2)}
        print(json.dumps(r), flush=True)
        results.append(r)
    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
