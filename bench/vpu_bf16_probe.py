"""Does Mosaic run bf16 VPU ops at 2x the f32 rate on this backend?

The turbo blane kernel sits at ~40% of f32 VPU light; NEXT.md's lever
list has carried "bf16 sublane packing (2x VPU rate IF Mosaic packs
(2,1)-tiled bf16) — unverified" for two rounds.  This settles it with a
minimal compute-bound Pallas kernel: a VMEM-resident (256, 128) block
through R rounds of max/add chains (the ACS op mix), timed in f32 vs
bf16.  If the bf16 time is ~half, the kernel rework is justified; if
equal, the lever dies.

Usage: python bench/vpu_bf16_probe.py [--rounds 512] [--reps 5]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, o_ref, *, rounds):
    a = x_ref[...]
    b = a * 1.0009765625
    for _ in range(rounds):
        # 4 VPU ops per round on the full block: the ACS mix (add + max)
        a = jnp.maximum(a + b, b)
        b = jnp.maximum(b + a, a)
    o_ref[...] = a


def run(dt, rounds, grid, shape, reps):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                    dtype=dt)

    f = pl.pallas_call(
        functools.partial(_kernel, rounds=rounds),
        out_shape=jax.ShapeDtypeStruct(shape, dt),
        grid=(grid,),
    )
    j = jax.jit(f)
    np.asarray(j(x).astype(jnp.float32)[0, 0])   # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(j(x).astype(jnp.float32)[0, 0])
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    ops = 4 * rounds * grid * shape[0] * shape[1] * 2  # 2 ops per max+add pair... counted: 4 elementwise ops/round
    return t, ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=512)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()
    shape = (256, 128)
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        t, ops = run(dt, a.rounds, a.grid, shape, a.reps)
        print(f"{name}: {t*1e3:8.2f} ms   {ops/t/1e12:6.2f} Tops/s")


if __name__ == "__main__":
    main()
