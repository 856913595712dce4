"""Speed-of-light accounting for the four Pallas kernels (VERDICT r4 #2).

BASELINE.json's north star says the filter/FFT/turbo kernels must hit
speed-of-light per chip — this script makes that a MEASURED gap instead of
a slogan.  For each kernel it:

  1. derives the arithmetic/byte count from the kernel's geometry (the
     same constants the kernel builders use),
  2. states the relevant peak for THIS chip (v5e: 197e12 bf16 MXU FLOP/s,
     819e9 B/s HBM, VPU derived below),
  3. measures the kernel N times inside ONE jitted scan (the ~29 ms
     axon-tunnel dispatch floor would otherwise swamp ms-scale kernels),
  4. prints light-vs-measured and the utilization %.

Peaks (public TPU v5e numbers, jax-ml.github.io/scaling-book):
  - MXU bf16: 197e12 FLOP/s.  Clock derived: f = 197e12/(4 MXU * 128*128*2)
    = 1.47 GHz.
  - HBM: 819e9 B/s.
  - VPU: (8,128) vector with 4 ALUs/lane-slot -> 4096 f32 ops/cycle
    ~= 6.0e12 op/s.  max() counts as one op; bf16 elementwise runs at
    ~the same rate (no packing assumed).

    python bench/roofline.py [--reps 20]

Prints one JSON line per kernel; PERF.md carries the distance-to-light
table with this script as provenance.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MXU_BF16 = 197e12
HBM_BPS = 819e9
VPU_F32 = 6.0e12


def _timed_scan(fn, init, reps):
    """Run ``fn`` reps times inside one jitted lax.scan; return s/call."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x0):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x0, None, length=reps)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.reshape(-1)[:4].astype(jnp.float32)

    np.asarray(run(init))                    # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(init))
    t1 = time.perf_counter()
    # subtract the dispatch floor using a 1-rep run
    @jax.jit
    def run1(x0):
        leaf = jax.tree_util.tree_leaves(fn(x0))[0]
        return leaf.reshape(-1)[:4].astype(jnp.float32)
    np.asarray(run1(init))
    t2 = time.perf_counter()
    np.asarray(run1(init))
    t3 = time.perf_counter()
    return ((t1 - t0) - (t3 - t2)) / (reps - 1)


def turbo_kernel(reps, unroll=16, combine_bf16=False):
    """Blane half-iteration at the DL bench geometry (B=768)."""
    import jax.numpy as jnp
    from lteax.kernels.turbo_mlm import half_iteration_blane

    k = 5824
    n, win, acq = k + 3, 128, 16
    n_w, cpad = 48, 9984
    rng = np.random.default_rng(0)
    um = jnp.asarray(rng.standard_normal((win, n_w, cpad)), jnp.bfloat16)
    vm = jnp.asarray(rng.standard_normal((win, n_w, cpad)), jnp.bfloat16)
    ab = jnp.zeros((n_w, 8, cpad), jnp.float32)

    def step(c):
        um_, a, b = c
        l, a2, b2 = half_iteration_blane(um_, vm, a, b, win, acq, n,
                                         mdtype="bf16", pinpad=True,
                                         unroll=unroll,
                                         combine_bf16=combine_bf16)
        return (l.astype(jnp.bfloat16), a2, b2)

    s_call = _timed_scan(step, (um, ab, ab), reps)

    # arithmetic: per (window-sublane, lane) element
    acq_ops = acq * 2 * (4 + 24 + 32)        # gammas + ACS + freeze blend
    half_w = win // 2
    store_ops = half_w * (2 * (4 + 24) + 1 + 4)   # fwd+bwd ACS, pin add,
    #                                               renorm amortized
    comb_ops = half_w * (2 * 53 + 2 * (4 + 24) + 1 + 4)
    ops = (acq_ops + store_ops + comb_ops) * n_w * cpad
    light = ops / VPU_F32
    return dict(kernel="turbo half-iteration (blane)", ops=ops,
                peak="VPU f32 6.0e12 op/s",
                light_ms=light * 1e3, measured_ms=s_call * 1e3,
                utilization_pct=100 * light / s_call)


def demap_kernel(reps, in_dtype="bf16"):
    """Fused demap+descramble at the DL full-grid geometry (B=768) with
    the production input staging dtype (DecoderTuning.demap_in)."""
    import jax.numpy as jnp
    from lteax.kernels.demap import demap_descr_planar_pallas

    b, npad = 768, 16896
    dt = jnp.bfloat16 if in_dtype == "bf16" else jnp.float32
    in_bytes = 2 if in_dtype == "bf16" else 4
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((b, npad)), dt)
    xi = jnp.asarray(rng.standard_normal((b, npad)), dt)
    inv = jnp.ones((b, npad), dt)
    sgn = jnp.ones((6, npad), jnp.float32)

    def step(c):
        out = demap_descr_planar_pallas(c, xi, inv, sgn, "64qam")
        return out[:, 0, :].astype(dt)               # feed back same shape

    s_call = _timed_scan(step, xr, reps)
    # HBM-bound: 3 staged inputs + 6-plane bf16 output
    bytes_moved = b * npad * (3 * in_bytes + 6 * 2)
    light = bytes_moved / HBM_BPS
    ops = b * npad * 92                       # 8 sq-dists + 6x subset mins
    light_vpu = ops / VPU_F32
    light = max(light, light_vpu)
    return dict(kernel="fused demap+descramble (planar)",
                bytes=bytes_moved, ops=ops,
                peak="HBM 819e9 B/s (vs VPU check)",
                light_ms=light * 1e3, measured_ms=s_call * 1e3,
                utilization_pct=100 * light / s_call)


def pss_kernel(reps):
    """Toeplitz-chunk PSS correlator at the scan geometry (C=64)."""
    import jax
    import jax.numpy as jnp
    from lteax.kernels.pss import pss_corr_mag_pallas
    from lteax.phy.sync import pss_time_filters
    from lteax.phy.config import PhyConfig

    cfg = PhyConfig(n_rb_dl=100)
    c, nsamp = 64, 4 * cfg.n_samps_subframe
    filt = np.asarray(pss_time_filters(cfg))          # (3, nf)
    nf = filt.shape[1]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, nsamp, 2)), jnp.float32)

    def step(xc):
        m = pss_corr_mag_pallas(
            jax.lax.complex(xc[..., 0], xc[..., 1]), filt)
        return xc + 0.0 * m[:, 0, :1, None]

    s_call = _timed_scan(step, x, reps)
    nc = -(-nf // 128)
    flops = c * nsamp * 3 * nf * 8 * (nc + 1) / nc    # cmplx MACs + halo pad
    light = flops / MXU_BF16
    return dict(kernel=f"PSS Toeplitz-chunk correlator (C={c})",
                flops=flops, peak="MXU bf16 197e12 FLOP/s",
                light_ms=light * 1e3, measured_ms=s_call * 1e3,
                utilization_pct=100 * light / s_call)


def polyphase_kernel(reps):
    """MXU polyphase resampler, 30.72 -> 23.04 Msps (p=3, q=4) on 20 ms."""
    import jax
    import jax.numpy as jnp
    from lteax.kernels.polyphase import resample_poly_pallas

    n = 614400                                 # 20 ms at 30.72 Msps
    p, q, tpp = 3, 4, 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)

    def step(xc):
        y = resample_poly_pallas(
            jax.lax.complex(xc[..., 0], xc[..., 1]), p, q,
            taps_per_phase=tpp)
        return xc + 0.0 * jnp.real(y[:1])[:, None]

    s_call = _timed_scan(step, x, reps)
    n_out = n * p // q
    k_in = tpp + 1                             # frame window length
    # the kernel runs r_rows shifted (F,Q)@(Q,P) matmuls with P padded to
    # the 128-lane grid: FLOPs = frames * r_rows*Q * 128 * 8 (complex)
    r_rows = -(-(k_in + q - 1) // q) + 1
    frames = n // q
    flops_padded = frames * r_rows * q * 128 * 8
    flops_useful = n_out * tpp * 8
    light = max(flops_padded / MXU_BF16,
                (n * 8 + n_out * 8) / HBM_BPS)
    return dict(kernel="polyphase resampler (p=3,q=4)",
                flops_useful=flops_useful, flops_padded=flops_padded,
                peak="MXU bf16 / HBM",
                light_ms=light * 1e3, measured_ms=s_call * 1e3,
                utilization_pct=100 * light / s_call)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--only", default=None)
    ap.add_argument("--unroll", type=int, default=4,
                    help="turbo kernel: trellis steps per loop body")
    ap.add_argument("--combine-bf16", action="store_true",
                    help="turbo kernel: bf16 grouped combine sums")
    a = ap.parse_args()
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lteax_jax_cache")
    except Exception:
        pass
    for name, fn in (("turbo", lambda r: turbo_kernel(
                          r, unroll=a.unroll, combine_bf16=a.combine_bf16)),
                     ("demap", demap_kernel),
                     ("pss", pss_kernel), ("polyphase", polyphase_kernel)):
        if a.only and a.only != name:
            continue
        try:
            r = fn(a.reps)
        except Exception as e:
            r = dict(kernel=name, error=f"{type(e).__name__}: {e}"[:160])
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in r.items()}), flush=True)


if __name__ == "__main__":
    main()
