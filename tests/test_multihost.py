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


@pytest.mark.slow
def test_multihost_scanner_kill_and_resume(tmp_path):
    """Config #5 runnable app (SURVEY §7 step 8): a 2-process
    jax.distributed scan over the channel axis completes; and after one
    worker is SIGKILLed mid-scan, a relaunch resumes from the per-worker
    checkpoints (finished channels skipped, full report set produced)."""
    import json
    import os
    import signal
    import subprocess
    import sys
    import time

    import numpy as np
    from lteax.apps.file_gen import GenConfig, generate
    from lteax.io.iq import write_iq

    # 6 channels: 4 live cells + 2 noise
    rng = np.random.default_rng(0)
    specs = []
    for i in range(6):
        p = tmp_path / f"ch{i}.bin"
        if i in (1, 4):
            x = 0.01 * (rng.standard_normal(30720)
                        + 1j * rng.standard_normal(30720)
                        ).astype(np.complex64)
        else:
            x = generate(GenConfig(n_rb_dl=6, n_cell_id=50 + i, n_frames=4))
        write_iq(str(p), np.asarray(x), "fc32")
        specs.append(f"ch{i}={p}")
    ckpt = str(tmp_path / "scan.ckpt")
    args = [sys.executable, "-m", "lteax.apps.scanner", *specs,
            "--multihost", "2", "--checkpoint", ckpt, "--port", "36917"]
    env = dict(os.environ)

    # launch the two workers directly (as the coordinator would)
    def launch():
        return [subprocess.Popen([*args, "--worker-idx", str(i)],
                                 cwd=os.path.dirname(os.path.dirname(
                                     os.path.abspath(__file__))),
                                 env=env, stdout=subprocess.PIPE, text=True)
                for i in range(2)]

    procs = launch()
    # wait until worker 1 has checkpointed at least one channel, then kill it
    w1_ck = ckpt + ".w1"
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(w1_ck) and json.load(open(w1_ck)):
            break
        if procs[1].poll() is not None:
            break                       # worker 1 already finished: rare/fast
        time.sleep(0.3)
    killed = procs[1].poll() is None
    if killed:
        procs[1].send_signal(signal.SIGKILL)
        procs[1].wait()
        # peer blocks at the final collective (or errors) — kill it too,
        # as the coordinator's relaunch-whole-job model does
        try:
            procs[0].wait(timeout=30)
        except subprocess.TimeoutExpired:
            procs[0].send_signal(signal.SIGKILL)
            procs[0].wait()
    else:
        procs[0].wait()
    done_before = len(json.load(open(w1_ck))) if os.path.exists(w1_ck) else 0

    # relaunch (the resume): must complete and report all 6 channels
    procs = launch()
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    reports = [json.loads(l) for out in outs for l in out.splitlines()
               if l.startswith("{")]          # skip Gloo banner lines
    chans = {r["channel"] for r in reports if "channel" in r}
    assert chans == {f"ch{i}" for i in range(6)}, chans
    cells = {r["channel"]: (r.get("n_cell_id", -1), r.get("mib"))
             for r in reports if "channel" in r}
    for i in (0, 2, 3, 5):         # live channels: exact cell id, MIB decoded
        assert cells[f"ch{i}"][0] == 50 + i and cells[f"ch{i}"][1], cells
    for i in (1, 4):               # noise channels: no MIB
        assert cells[f"ch{i}"][1] is None, cells
    totals = [r["multihost_total_cells"] for r in reports
              if "multihost_total_cells" in r]
    assert totals == [4, 4], totals
    # resume actually reused worker-1 checkpoints from before the kill
    if killed and done_before:
        w1_out = outs[1]
        assert done_before <= len(json.load(open(w1_ck)))
