"""nerf_sandbox_tpu — a TPU-native (JAX/XLA/Pallas) NeRF framework.

A ground-up rebuild of the capabilities of ``evan-wes/nerf-sandbox``
(PyTorch, single GPU) as an idiomatic JAX framework:

* pure-function geometry / sampling / integration core (``core/``)
* pytree-parameterised NeRF models (``models/``)
* fused Pallas TPU kernels for the hot ray-march path (``ops/``)
* mesh-parallel training via ``jax.sharding`` (``parallel/``)
* host-side data loading, training orchestration, validation rendering
  (``data/``, ``train/``, ``render/``, ``utils/``)

The public CLI mirrors the reference's ``train_nerf.py`` flag surface.
"""

from nerf_sandbox_tpu.version import __version__

__all__ = ["__version__"]
