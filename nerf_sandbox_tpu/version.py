"""Version of the nerf_sandbox_tpu framework (reference: nerf_sandbox/version.py:2)."""
__version__ = "1.0.0"
