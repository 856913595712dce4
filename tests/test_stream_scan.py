"""Streaming scanner service: windowed scan, checkpoint resume, ctrl verbs."""

import json
import socket

import numpy as np

from lteax.phy.config import PhyConfig
from lteax.io.iq import write_iq
from lteax.apps.file_gen import GenConfig, generate
from lteax.apps.stream_scan import StreamScanService


def _capture(tmp_path, n_frames=5, cell_id=99):
    x = generate(GenConfig(n_rb_dl=6, n_frames=n_frames, n_cell_id=cell_id))
    path = str(tmp_path / "cap.bin")
    write_iq(path, np.asarray(x))
    return path


def test_stream_scan_windows_and_resume(tmp_path):
    path = _capture(tmp_path)
    cfg = PhyConfig(n_rb_dl=6)
    ck = str(tmp_path / "ck.json")

    svc = StreamScanService(path, cfg, window_sf=20, ckpt_path=ck)
    try:
        res = svc.run(max_windows=1)
    finally:
        svc.stop()
    assert res[0]["n_cell_id"] == 99 and res[0]["sfn"] == 0

    # resume: w0 must come from the checkpoint, w1 scanned live; the 10
    # leftover subframes (< 12 needed for MIB/SI headroom) end the run
    svc2 = StreamScanService(path, cfg, window_sf=20, ckpt_path=ck)
    try:
        res2 = svc2.run()
    finally:
        svc2.stop()
    assert sorted(res2) == [0, 1]
    assert res2[1]["n_cell_id"] == 99 and res2[1]["sfn"] == 2
    assert json.load(open(ck)).keys() == {"w0", "w1"}


def test_stream_scan_ctrl_status_and_stop(tmp_path):
    path = _capture(tmp_path)
    svc = StreamScanService(path, PhyConfig(n_rb_dl=6), window_sf=20)
    try:
        def cmd(line):
            with socket.create_connection(("127.0.0.1", svc.ctrl.port),
                                          timeout=5) as s:
                s.sendall(line.encode() + b"\n")
                return s.makefile().readline().strip()

        st = json.loads(cmd("status")[3:])
        assert st["windows_done"] == 0 and st["running"]
        assert cmd("stop") == "ok stopping"
        assert svc.run() == {}          # stopped before any window
        st = json.loads(cmd("status")[3:])
        assert not st["running"]
    finally:
        svc.stop()
