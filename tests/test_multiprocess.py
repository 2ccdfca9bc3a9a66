"""Real multi-PROCESS execution (VERDICT r2 #3): two JAX processes with 4
virtual CPU devices each form one 8-device global mesh (Gloo collectives);
the global train step must match the single-process 8-device run exactly.

The reference is single-process (SURVEY.md §2 #27/#28), so the contract is
self-imposed: multi-process numerics == single-process numerics.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _spawn(pid: int, port: int, steps: int = 3, local_devices: int = 4,
           extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["PYTHONPATH"] = str(REPO)
    return subprocess.Popen(
        [sys.executable, "-m", "nerf_sandbox_tpu.scripts.mp_smoke",
         "--coordinator_address", f"localhost:{port}",
         "--num_processes", "2", "--process_id", str(pid),
         "--steps", str(steps), *extra],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
        text=True)


def test_two_process_train_matches_single_process():
    from nerf_sandbox_tpu.scripts.mp_smoke import run_steps

    # single-process oracle on this test session's 8-device CPU mesh
    want = run_steps(steps=3)

    port = 21000 + os.getpid() % 9000
    procs = [_spawn(0, port), _spawn(1, port)]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=480)
        assert p.returncode == 0, f"mp process failed:\n{stderr[-3000:]}"
        line = [ln for ln in stdout.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    for rec in outs:
        assert rec["n_processes"] == 2
        assert rec["global_devices"] == 8
    # both processes observe the same global losses
    np.testing.assert_allclose(outs[0]["losses"], outs[1]["losses"],
                               rtol=1e-6)
    # and they match the single-process 8-device run
    np.testing.assert_allclose(outs[0]["losses"], want, rtol=1e-5,
                               err_msg="2-process vs single-process")


def test_two_process_sharded_scene_matches_single_process():
    """Per-host data loading (--shard_scene): each process ZEROES the
    frames its devices do not own (emulating the loaders' image_filter —
    those frames are never decoded on this host), the image bank is
    frame-sharded over the global mesh, and the global losses still match
    the single-process replicated-bank run exactly: the sharded gather
    reads every pixel from its owning host only."""
    from nerf_sandbox_tpu.scripts.mp_smoke import run_steps

    want = run_steps(steps=3)   # replicated-bank oracle on the 8-dev mesh

    port = 21000 + (os.getpid() + 377) % 9000
    procs = [_spawn(0, port, extra=("--shard_scene",)),
             _spawn(1, port, extra=("--shard_scene",))]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=480)
        assert p.returncode == 0, f"mp process failed:\n{stderr[-3000:]}"
        line = [ln for ln in stdout.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    np.testing.assert_allclose(outs[0]["losses"], outs[1]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(outs[0]["losses"], want, rtol=1e-5,
                               err_msg="sharded-scene 2-process vs "
                                       "single-process replicated")
