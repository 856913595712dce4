"""IQ recorder app (LTE_file_recorder parity)."""

import socket
import threading

import numpy as np

from lteax.apps.recorder import record
from lteax.io.iq import write_iq, read_iq


def test_record_convert(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(100000)
         + 1j * rng.standard_normal(100000)).astype(np.complex64) * 0.1
    src = str(tmp_path / "src.sc8")
    dst = str(tmp_path / "dst.fc32")
    write_iq(src, x, "sc8")
    n = record(src, dst, in_fmt="sc8", out_fmt="fc32", n_samples=60000)
    assert n == 60000
    got = read_iq(dst, "fc32")
    assert len(got) == 60000
    np.testing.assert_allclose(got, x[:60000], atol=0.012)


def test_record_via_ctrl(tmp_path):
    from lteax.apps.recorder import main as rec_main
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(5000)
         + 1j * rng.standard_normal(5000)).astype(np.complex64) * 0.1
    src = str(tmp_path / "s.fc32")
    dst = str(tmp_path / "d.fc32")
    write_iq(src, x, "fc32")
    th = threading.Thread(target=rec_main, args=(
        ["--in-path", src, "--out", dst, "--samples", "5000",
         "--ctrl-port", "0"],))
    # port 0 race: use a fixed high port instead
    port = 37411
    th = threading.Thread(target=rec_main, args=(
        ["--in-path", src, "--out", dst, "--samples", "5000",
         "--ctrl-port", str(port)],), daemon=True)
    th.start()
    import time
    deadline = time.time() + 10
    resp = None
    while time.time() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2) as s:
                s.sendall(b"record\n")
                resp = s.makefile().readline().strip()
            break
        except OSError:
            time.sleep(0.2)
    th.join(timeout=15)
    assert resp == "ok recorded 5000", resp
    assert len(read_iq(dst, "fc32")) == 5000


def test_record_from_tcp_source(tmp_path):
    """End-to-end live-ingest: a generated capture streamed over TCP as
    sc8 is recorded to file and scan-decodes to the right cell."""
    import socket
    import threading
    import numpy as np
    from lteax.io import native
    from lteax.io.iq import to_iq_f32, read_iq
    from lteax.apps.recorder import record_tcp
    from lteax.apps.file_gen import GenConfig, generate
    from lteax.apps.file_scan import scan

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    gc = GenConfig(n_rb_dl=6, n_cell_id=42, n_frames=2)
    x = generate(gc)
    x = (x / (4 * np.max(np.abs(x)))).astype(np.complex64)  # sc8 headroom
    sc8 = np.clip(np.round(to_iq_f32(x).reshape(-1) * 127), -128,
                  127).astype(np.int8)

    with native.IqTcpSource(fmt="sc8") as src:
        def sender():
            with socket.create_connection(("127.0.0.1", src.port),
                                          timeout=5) as c:
                c.sendall(sc8.tobytes())
        t = threading.Thread(target=sender)
        t.start()
        out = str(tmp_path / "cap.fc32")
        n, dropped = record_tcp(src, out, n_samples=len(x))
        t.join()
    assert n == len(x) and dropped == 0
    r = scan(read_iq(out, "fc32"), gc.phy)
    assert r.n_cell_id == 42 and r.mib is not None
