"""Package install for nerf_sandbox_tpu (role of reference setup.py:1-63)."""

from pathlib import Path

from setuptools import find_packages, setup

HERE = Path(__file__).parent


def _version() -> str:
    ns: dict = {}
    exec((HERE / "nerf_sandbox_tpu" / "version.py").read_text(), ns)
    return ns["__version__"]


setup(
    name="nerf-sandbox-tpu",
    version=_version(),
    description="TPU-native NeRF framework (JAX/XLA/Pallas) — a ground-up "
                "rebuild of evan-wes/nerf-sandbox for TPU hardware",
    long_description=(HERE / "README.md").read_text()
    if (HERE / "README.md").exists() else "",
    long_description_content_type="text/markdown",
    packages=find_packages(include=["nerf_sandbox_tpu", "nerf_sandbox_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax>=0.4.30",
        "numpy",
        "optax",
        "imageio",
        "imageio-ffmpeg",
        "opencv-python-headless",
    ],
    extras_require={
        "tb": ["tensorboard", "torch"],     # TensorBoard logging backend
        "dev": ["pytest", "torch"],          # parity tests need the oracle
    },
    entry_points={
        "console_scripts": [
            "nerf-tpu-train=nerf_sandbox_tpu.scripts.train_nerf:main",
            "nerf-tpu-compare=nerf_sandbox_tpu.scripts.compare_with_reference:main",
            "nerf-tpu-eval=nerf_sandbox_tpu.scripts.eval_nerf:main",
        ],
    },
)
