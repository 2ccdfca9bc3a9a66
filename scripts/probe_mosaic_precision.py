"""Probe: does Mosaic truncate f32 matmul inputs at DEFAULT precision?

The XLA-path one-hot idioms all pin ``precision=HIGHEST`` (sampling.py:124,
sampler.py:271, kplanes.py:132, rays.py:139) because TPU (and oneDNN CPU)
default-precision f32 dots truncate inputs to bf16.  The fused eval kernel
(ops/fused_raymarch.py) uses the same idioms WITHOUT the pin — this probe
measures, on the real TPU, the error of a Pallas dot(f32, f32) at default
vs HIGHEST precision against an exact f64 oracle, for the two shapes the
kernel cares about: the encode args matmul and a one-hot value relayout.

Run: python scripts/probe_mosaic_precision.py   (needs the axon TPU)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _dot_kernel(a_ref, b_ref, o_ref, *, prec):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                       precision=prec)


def run(name, a, b):
    oracle = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    for label, prec in (("default", None),
                        ("HIGH", jax.lax.Precision.HIGH),
                        ("HIGHEST", jax.lax.Precision.HIGHEST)):
        k = functools.partial(_dot_kernel, prec=prec)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]),
                                              jnp.float32),
        )(jnp.asarray(a), jnp.asarray(b))
        err = np.abs(np.asarray(out, np.float64) - oracle)
        rel = err / np.maximum(np.abs(oracle), 1e-30)
        print(f"{name:24s} {label:8s} max_abs={err.max():.3e} "
              f"max_rel={rel.max():.3e}")


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # encode-args shape: pts (Q,3) in [-2,2] x bands (3, EP) up to 512
    Q, EP = 256, 128
    pts = rng.uniform(-2, 2, (Q, 8)).astype(np.float32)  # pad 3->8 sublanes
    B = np.zeros((8, EP), np.float32)
    B[:3] = np.repeat(2.0 ** np.arange(0, 10), 13)[:EP][None].repeat(3, 0)
    run("encode args (pts@bands)", pts, B)

    # one-hot relayout: onehot (Q,128) x z-values (128,128) in [2,6]
    oh = np.zeros((Q, 128), np.float32)
    oh[np.arange(Q), rng.integers(0, 128, Q)] = 1.0
    z = rng.uniform(2, 6, (128, 128)).astype(np.float32)
    run("one-hot relayout (oh@z)", oh, z)

    # triangular cumsum: tri (16,16) x logT (16,128) in [-80, 0]
    tri = np.tril(np.ones((16, 16), np.float32), -1)
    lg = rng.uniform(-5, 0, (16, 128)).astype(np.float32)
    run("tri cumsum (tri@logT)", tri, lg)


if __name__ == "__main__":
    main()
