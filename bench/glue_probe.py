"""Microbench: XLA glue ops inside the turbo iteration loop on the chip.

Times the (C, K) axis-1 gather (QPP interleave), the step-major transpose,
and the interleave+extrinsic chain — the per-half-iteration costs that are
NOT the Pallas kernel.  Guides whether glue or kernel dominates.

    python bench/glue_probe.py [--c 4992] [--k 5827] [--inner 8]
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
    ap.add_argument("--c", type=int, default=4992)
    ap.add_argument("--k", type=int, default=5827)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    a = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from lteax.phy.tables.turbo_qpp import qpp_interleaver

    dt = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((a.c, a.k)).astype(np.float32)).astype(dt))
    pi = jnp.asarray(qpp_interleaver(5824)[: a.k] % a.k)
    win = 128
    n_w = -(-a.k // win)

    def timed(name, fn):
        def run(x):
            def body(i, acc):
                xd, acc = jax.lax.optimization_barrier((x, acc))
                return acc + fn(xd)
            return jax.lax.fori_loop(0, a.inner, body,
                                     jnp.zeros((), jnp.float32))
        f = jax.jit(run)
        np.asarray(f(x))
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) / a.inner * 1e3
        print(f"{name:26s} {t:7.3f} ms")

    timed("copy (x+1)", lambda x: (x + 1).astype(jnp.float32).sum())
    timed("gather x[:, pi]", lambda x: x[:, pi].astype(jnp.float32).sum())
    timed("transpose step-major",
          lambda x: jnp.pad(x, ((0, 0), (0, n_w * win - a.k)))
          .reshape(a.c, n_w, win).transpose(2, 0, 1)
          .astype(jnp.float32).sum())
    timed("extrinsic chain",
          lambda x: (0.75 * (x - x * 0.5 - x * 0.25))[:, pi]
          .astype(jnp.float32).sum())
    timed("crc matmul int32",
          lambda x: ((x > 0).astype(jnp.int32)
                     @ jnp.ones((a.k, 24), jnp.int32) % 2).sum()
          .astype(jnp.float32))


if __name__ == "__main__":
    main()
