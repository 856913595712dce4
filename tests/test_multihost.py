"""Multi-process (simulated multi-host) collectives: jax.distributed over
2 local processes with a channel axis across hosts (SURVEY.md §4)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_multihost_dryrun():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench", "multihost_dryrun.py"),
         "--port", "36719"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=280)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "multihost dryrun OK" in r.stdout
