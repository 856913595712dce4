"""ctypes binding for the native C++ IQ reader (lteax/native/iq_reader.cc).

Falls back to the numpy reader (io.iq) when the shared library is missing
and cannot be built.  Build happens lazily, once, via make.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libiqreader.so")
_FMT = {"fc32": 0, "sc8": 1, "sc16": 2}

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.iq_read.restype = ctypes.c_int64
    lib.iq_read.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
                            ctypes.c_int64, ctypes.c_void_p]
    lib.iq_stream_open.restype = ctypes.c_void_p
    lib.iq_stream_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_int64]
    lib.iq_stream_next.restype = ctypes.c_int64
    lib.iq_stream_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.iq_stream_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_iq_native(path: str, fmt: str = "fc32", count: int = -1,
                   offset_samples: int = 0) -> np.ndarray:
    """-> (n, 2) float32 IQ pairs (device-boundary layout)."""
    lib = _load()
    if lib is None:
        from lteax.io.iq import read_iq, to_iq_f32
        return to_iq_f32(read_iq(path, fmt, count, offset_samples))
    if count < 0:
        sizes = {"fc32": 8, "sc8": 2, "sc16": 4}
        count = (os.path.getsize(path) - offset_samples * sizes[fmt]) \
            // sizes[fmt]
    out = np.empty((count, 2), dtype=np.float32)
    n = lib.iq_read(path.encode(), _FMT[fmt], offset_samples, count,
                    out.ctypes.data_as(ctypes.c_void_p))
    if n < 0:
        raise IOError(f"iq_read failed for {path}")
    return out[:n]


class IqStream:
    """Background-prefetch chunked reader: conversion overlaps compute."""

    def __init__(self, path: str, fmt: str = "fc32",
                 chunk_samples: int = 1 << 20):
        lib = _load()
        if lib is None:
            raise RuntimeError("native iq reader unavailable")
        self._lib = lib
        self._chunk = chunk_samples
        self._h = lib.iq_stream_open(path.encode(), _FMT[fmt], chunk_samples)
        if not self._h:
            raise IOError(f"cannot open {path}")

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty((self._chunk, 2), dtype=np.float32)
        n = self._lib.iq_stream_next(self._h, out.ctypes.data_as(
            ctypes.c_void_p))
        if n == 0:
            raise StopIteration
        return out[:n]

    def close(self):
        if self._h:
            self._lib.iq_stream_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _load_tcp():
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib.iq_tcp_open, "_wired"):
        lib.iq_tcp_open.restype = ctypes.c_void_p
        lib.iq_tcp_open.argtypes = [ctypes.c_uint16, ctypes.c_int,
                                    ctypes.c_int64]
        lib.iq_tcp_port.restype = ctypes.c_int
        lib.iq_tcp_port.argtypes = [ctypes.c_void_p]
        lib.iq_tcp_connected.restype = ctypes.c_int
        lib.iq_tcp_connected.argtypes = [ctypes.c_void_p]
        lib.iq_tcp_dropped.restype = ctypes.c_int64
        lib.iq_tcp_dropped.argtypes = [ctypes.c_void_p]
        lib.iq_tcp_read.restype = ctypes.c_int64
        lib.iq_tcp_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_int]
        lib.iq_tcp_close.argtypes = [ctypes.c_void_p]
        lib.iq_tcp_open._wired = True
    return lib


class IqTcpSource:
    """Native TCP IQ ingest: a C++ receive thread converts sc8/sc16/fc32
    to float32 I/Q into a ring buffer outside the GIL; overruns are
    dropped and counted (the reference's radio overrun accounting).

    (reference capability: gr-osmosdr / UHD streaming sources of
    LTE_fdd_dl_scan and LTE_fdd_enb_radio — TCP transport in place of
    SDR hardware, rtl_tcp-style.)
    """

    def __init__(self, port: int = 0, fmt: str = "fc32",
                 ring_samples: int = 1 << 22):
        self._lib = _load_tcp()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.iq_tcp_open(port, _FMT[fmt], ring_samples)
        if not self._h:
            raise OSError(f"cannot bind IQ server on port {port}")
        self._port = int(self._lib.iq_tcp_port(self._h))
        self._dropped = 0

    @property
    def port(self) -> int:
        return self._port

    @property
    def connected(self) -> bool:
        return bool(self._h) and bool(self._lib.iq_tcp_connected(self._h))

    @property
    def dropped(self) -> int:
        if self._h:
            self._dropped = int(self._lib.iq_tcp_dropped(self._h))
        return self._dropped

    def read(self, max_samples: int, timeout_ms: int = 1000) -> np.ndarray:
        """Up to max_samples complex64 samples (possibly empty)."""
        if not self._h:
            return np.zeros(0, dtype=np.complex64)
        out = np.empty(2 * max_samples, dtype=np.float32)
        n = self._lib.iq_tcp_read(
            self._h, out.ctypes.data_as(ctypes.c_void_p), max_samples,
            timeout_ms)
        return out[:2 * n].view(np.complex64)

    def close(self):
        if self._h:
            self._dropped = int(self._lib.iq_tcp_dropped(self._h))
            self._lib.iq_tcp_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
