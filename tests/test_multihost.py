"""Multi-host layer: real 2-process `jax.distributed` run on localhost.

Drives tools/multihost_dryrun.py — two separate processes (CPU backend, 2
virtual devices each) form a 4-device global mesh, assemble a global pose
batch from per-process shards, and run ``sharded_positionable`` whose
psum crosses the process boundary (the DCN path of SURVEY.md section
2.10).  Each worker asserts its local result shards equal the
single-process oracle.
"""

import os
import subprocess

import pytest
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_positionable():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_dryrun.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST OK" in out.stdout
