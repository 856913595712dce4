"""Streaming scanner service: windowed scan, checkpoint resume, ctrl verbs."""

import pytest
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


@pytest.mark.heavy
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


def test_stream_scan_live_tcp():
    """Live scanning service: IQ streamed over TCP (sc8), scanned window
    by window; status reports live mode and results carry the cell."""
    import socket
    import threading
    import numpy as np
    from lteax.io import native
    from lteax.io.iq import to_iq_f32
    from lteax.apps.file_gen import GenConfig, generate
    from lteax.apps.stream_scan import StreamScanService
    from lteax.phy.config import PhyConfig

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    gc = GenConfig(n_rb_dl=6, n_cell_id=55, n_frames=4)
    x = generate(gc)
    x = (x / (4 * np.max(np.abs(x)))).astype(np.complex64)
    sc8 = np.clip(np.round(to_iq_f32(x).reshape(-1) * 127), -128,
                  127).astype(np.int8)

    with native.IqTcpSource(fmt="sc8") as src:
        svc = StreamScanService(None, PhyConfig(n_rb_dl=6), fmt="sc8",
                                window_sf=40, tcp_source=src,
                                live_idle_s=2.0)

        def sender():
            with socket.create_connection(("127.0.0.1", src.port),
                                          timeout=5) as c:
                for i in range(0, len(sc8), 8192):   # trickle in chunks
                    c.sendall(sc8[i:i + 8192].tobytes())

        t = threading.Thread(target=sender)
        t.start()
        try:
            results = svc.run(max_windows=1)
            st = svc.status()
        finally:
            t.join()
            svc.stop()
    assert results[0]["n_cell_id"] == 55
    assert results[0]["mib"]["n_rb_dl"] == 6
    assert st["live"] and st["overruns_dropped"] == 0
