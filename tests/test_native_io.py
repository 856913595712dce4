"""Native C++ IQ reader (ctypes binding, lazy-built)."""

import numpy as np
import pytest

from lteax.io.iq import write_iq
from lteax.io import native


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_read_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(50000)
         + 1j * rng.standard_normal(50000)).astype(np.complex64) * 0.1
    for fmt, atol in (("fc32", 0.0), ("sc8", 0.012)):
        p = str(tmp_path / f"c.{fmt}")
        write_iq(p, x, fmt)
        got = native.read_iq_native(p, fmt)
        assert got.shape == (50000, 2) and got.dtype == np.float32
        np.testing.assert_allclose(got[:, 0] + 1j * got[:, 1], x, atol=atol)
        # offset + count
        part = native.read_iq_native(p, fmt, count=1000, offset_samples=100)
        np.testing.assert_allclose(part, got[100:1100], atol=0)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_stream(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(70001)
         + 1j * rng.standard_normal(70001)).astype(np.complex64) * 0.1
    p = str(tmp_path / "s.fc32")
    write_iq(p, x, "fc32")
    chunks = []
    with native.IqStream(p, "fc32", chunk_samples=8192) as s:
        for c in s:
            chunks.append(c.copy())
    got = np.concatenate(chunks)
    assert len(got) == 70001
    np.testing.assert_allclose(got[:, 0] + 1j * got[:, 1], x, atol=0)


def test_iq_tcp_source_roundtrip_and_overrun():
    """Native TCP ingest: sc8 samples sent over localhost come back as
    converted complex64 in order; overfilling the ring drops + counts."""
    import socket
    import time
    import numpy as np
    from lteax.io import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    with native.IqTcpSource(fmt="sc8", ring_samples=4096) as src:
        with socket.create_connection(("127.0.0.1", src.port), timeout=5):
            pass  # connect/disconnect must not wedge the server
        data = np.arange(-64, 64, dtype=np.int8)          # 64 IQ pairs
        with socket.create_connection(("127.0.0.1", src.port),
                                      timeout=5) as c:
            c.sendall(data.tobytes())
            got = src.read(64, timeout_ms=2000)
            while len(got) < 64:
                more = src.read(64 - len(got), timeout_ms=2000)
                assert len(more), "timed out waiting for samples"
                got = np.concatenate([got, more])
            ref = data.astype(np.float32).reshape(-1, 2) / 128.0
            np.testing.assert_allclose(
                np.stack([got.real, got.imag], -1), ref, rtol=1e-6)
            # overrun: send far more than the ring holds without reading
            big = np.zeros(2 * 3 * 4096, np.int8)
            c.sendall(big.tobytes())
            deadline = time.time() + 5
            while src.dropped == 0 and time.time() < deadline:
                time.sleep(0.05)
            assert src.dropped > 0
            # drain works and yields at most the ring capacity
            drained = 0
            while True:
                chunk = src.read(4096, timeout_ms=200)
                if not len(chunk):
                    break
                drained += len(chunk)
            assert 0 < drained <= 4096 + 64
