"""Env-gated retest hook for the structured-de-match backend crash
(VERDICT r1 item 9; KNOWN_ISSUES.md "Structured rate de-matching crashes
the TPU worker").

Run with ``LTEAX_RETEST_STRUCT=1 LTEAX_TEST_TPU=1`` on the real chip.  The
day the backend's Mosaic update fixes the crash, this test goes green —
then flip the LTEAX_STRUCT_DEMATCH default in
``lteax/phy/channels/pdsch.py::soft_dematch`` and delete the KNOWN_ISSUES
entry.  On CPU it validates the repro script's levels in interpret-free
form (the crash is TPU-only, so CPU checks correctness of the ladder).
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(os.environ.get("LTEAX_RETEST_STRUCT") != "1",
                    reason="retest hook: set LTEAX_RETEST_STRUCT=1 (and "
                           "LTEAX_TEST_TPU=1 for the real repro)")
def test_struct_dematch_backend_retest():
    r = subprocess.run(
        [sys.executable, "scripts/repro_struct_dematch.py"],
        capture_output=True, text=True, timeout=2400,
        env={k: v for k, v in os.environ.items()
             if k != "LTEAX_RETEST_STRUCT"})
    sys.stderr.write(r.stdout + r.stderr)
    assert r.returncode == 0, (
        "structured-de-match composition still failing on this backend — "
        "keep LTEAX_STRUCT_DEMATCH default off")


@pytest.mark.heavy
def test_struct_dematch_cpu_correctness():
    """The ladder's levels 0/1 decode bit-exactly on CPU (fast sanity that
    the repro itself is valid; the crash is a TPU-backend property)."""
    env = dict(os.environ)
    env.pop("LTEAX_STRUCT_DEMATCH", None)
    for lvl in (0, 1):
        env["LTEAX_PLATFORM"] = "cpu"        # interpret-mode Pallas
        r = subprocess.run(
            [sys.executable, "scripts/repro_struct_dematch.py",
             "--level", str(lvl)],
            capture_output=True, text=True, timeout=1200, env=env)
        assert r.returncode == 0, (lvl, r.stdout[-500:], r.stderr[-500:])
