"""Isolated turbo half-iteration kernel timing on the chip.

Times `half_iteration_pallas` alone at bench-representative shapes
(K=5824, C=13 codeblocks x B subframes) to know the kernel's share of the
DL headline and the ceiling of any kernel-level optimization.

    python bench/turbo_kernel_bench.py [--cb 4992] [--win 128] [--acq 16]
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
    ap.add_argument("--cb", type=int, default=4992)
    ap.add_argument("--k", type=int, default=5824)
    ap.add_argument("--win", type=int, default=128)
    ap.add_argument("--acq", type=int, default=16)
    ap.add_argument("--tb", type=int, default=16)
    ap.add_argument("--gb", type=int, default=0)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--inner", type=int, default=4)
    a = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from lteax.kernels.turbo_mlm import half_iteration_pallas

    n = a.k + 3
    n_w = -(-n // a.win)
    gb = a.gb or max(1, min(128 // n_w, a.cb))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((a.cb, n)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((a.cb, n)).astype(np.float32))
    ab = jnp.zeros((a.cb, n_w, 8), jnp.float32)

    def run(u, v, ab):
        def body(i, carry):
            l, an, bn = half_iteration_pallas(u, v, carry[1], carry[2],
                                              a.win, a.acq, n, tb=a.tb, gb=gb)
            return (carry[0] + l.sum(), an, bn)
        out = jax.lax.fori_loop(0, a.inner, body, (jnp.float32(0), ab, ab))
        return out[0]

    f = jax.jit(run)
    t0 = time.perf_counter()
    np.asarray(f(u, v, ab))  # transfer = reliable completion barrier (PERF.md)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s  "
          f"(cb={a.cb} k={a.k} win={a.win} acq={a.acq} tb={a.tb} gb={gb})")
    ts = []
    for _ in range(a.reps):
        t0 = time.perf_counter()
        np.asarray(f(u, v, ab))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts)) / a.inner
    per_cb = t / a.cb * 1e6
    print(f"half-iteration: {t*1e3:8.2f} ms  ({per_cb:.2f} us/codeblock; "
          f"x12 half-iters = {12*per_cb:.1f} us/cb for 6 iterations)")


if __name__ == "__main__":
    main()
