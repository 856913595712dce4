"""Probe: SC-FDMA IDFT de-precoding variants on the real chip.

Times N=1200 inverse DFT over a (B*12, 1200) batch (the UL bench shape)
for several implementations, and reports max abs error vs numpy ifft:

  fft        jnp.fft.ifft (current production path)
  dense-hi   (B,1200)@(1200,1200) dense W, HIGHEST precision
  dense-def  same, default precision
  fact-hi    two-stage Cooley-Tukey 30x40 (current dft_factored, HIGHEST)
  foldN-P    batch-folded Cooley-Tukey, split n1 x n2, precision P:
             every stage is a (rows, k)@(k, k) matmul with rows = B*other.

    python bench/ul_dft_probe.py [--batch 768] [--reps 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=16,
                    help="apply the transform this many times inside one jit "
                         "(isolates marginal cost from dispatch overhead)")
    a = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from lteax.phy.dft import dft_factored

    n = 1200
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((a.batch, n))
         + 1j * rng.standard_normal((a.batch, n))).astype(np.complex64)
    ref = np.fft.ifft(x, axis=-1)

    w_full = np.exp(2j * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    w_full = (w_full / n).astype(np.complex64)
    wr, wi = np.real(w_full).copy(), np.imag(w_full).copy()

    def dense(prec):
        def f(xc):
            xr_, xi_ = jnp.real(xc), jnp.imag(xc)
            yr = (jnp.matmul(xr_, wr, precision=prec)
                  - jnp.matmul(xi_, wi, precision=prec))
            yi = (jnp.matmul(xr_, wi, precision=prec)
                  + jnp.matmul(xi_, wr, precision=prec))
            return yr + 1j * yi
        return f

    def folded(n1, n2, prec):
        # x[b, n1 + N1*n2]; inner DFT_{N2} over n2, twiddle, outer DFT_{N1}
        s = 2j
        w1 = np.exp(s * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
        w2 = np.exp(s * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
        tw = np.exp(s * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
        w1 = (w1 / n1).astype(np.complex64)
        w2 = (w2 / n2).astype(np.complex64)
        tw = tw.astype(np.complex64)

        def cmm(xc, wc):
            # (rows, k) @ (k, k) with complex split -> 4 real matmuls
            ar, ai = jnp.real(xc), jnp.imag(xc)
            br, bi = np.real(wc).copy(), np.imag(wc).copy()
            return ((jnp.matmul(ar, br, precision=prec)
                     - jnp.matmul(ai, bi, precision=prec))
                    + 1j * (jnp.matmul(ar, bi, precision=prec)
                            + jnp.matmul(ai, br, precision=prec)))

        def f(xc):
            b = xc.shape[0]
            v = xc.reshape(b, n2, n1)           # v[b, n2, n1]
            v = jnp.swapaxes(v, -1, -2)         # [b, n1, n2]
            av = cmm(v.reshape(b * n1, n2), w2.T).reshape(b, n1, n2)
            av = av * tw[None]                  # twiddle [n1, k2]
            av = jnp.swapaxes(av, -1, -2)       # [b, k2, n1]
            c = cmm(av.reshape(b * n2, n1), w1.T).reshape(b, n2, n1)
            # X[N2*k1 + k2] = C[k2, k1] -> transpose to [b, k1, k2]? no:
            # index X[k] with k = N2*k1 + k2 -> reshape from [b, k1, k2]
            c = jnp.swapaxes(c, -1, -2)         # [b, k1, k2]
            return c.reshape(b, n)
        return f

    hi = jax.lax.Precision.HIGHEST
    de = jax.lax.Precision.DEFAULT

    variants = {
        "fft": lambda xc: jnp.fft.ifft(xc, axis=-1),
        "dense-hi": dense(hi),
        "dense-def": dense(de),
        "fact-hi": lambda xc: dft_factored(xc, inverse=True),
        "fold30x40-hi": folded(30, 40, hi),
        "fold30x40-def": folded(30, 40, de),
        "fold16x75-hi": folded(16, 75, hi),
        "fold48x25-hi": folded(48, 25, hi),
    }
    xj = jnp.asarray(np.stack([x.real, x.imag], -1))
    print(f"batch {a.batch} x N={n}", file=sys.stderr)
    for name, fn in variants.items():
        # complex arrays can't cross host<->device on this backend
        scale = np.float32(np.sqrt(n))
        def wrap(xi, fn=fn):
            y = fn((xi[..., 0] + 1j * xi[..., 1]).astype(jnp.complex64))
            def body(_, c):
                return fn(c * scale)
            y = jax.lax.fori_loop(0, a.inner - 1, body, y)
            return jnp.stack([jnp.real(y), jnp.imag(y)], -1)
        f = jax.jit(wrap)
        try:
            y = f(xj)
            jax.block_until_ready(y)
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s} FAILED: {e}", file=sys.stderr)
            continue
        if a.inner == 1:
            yh = np.asarray(y)
            err = float(np.max(np.abs((yh[..., 0] + 1j * yh[..., 1]) - ref)))
        else:
            err = float("nan")  # repeated application: err only valid inner=1
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(f(xj))  # force full round trip to host
            ts.append(time.perf_counter() - t0)
        t = np.median(ts) * 1e3
        print(f"{name:16s} {t:8.2f} ms   maxerr {err:.2e}")


if __name__ == "__main__":
    main()
