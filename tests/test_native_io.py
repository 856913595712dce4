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
