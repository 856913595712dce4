"""Cell-search front-end throughput: PSS correlation Msps per chip.

The reference scanner's hot loop is the PSS matched filter over raw samples
(SURVEY §3.1/§3.4 — ``liblte_phy_find_pss_and_fine_timing`` runs serially
per EARFCN).  Here all carriers are one batched jitted call; this bench
measures how many complex Msps of raw 20 MHz capture one chip can sweep for
PSS (3 roots), i.e. the band-scan rate ceiling.

    python bench/scan_throughput.py [--carriers 16] [--len-sf 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--carriers", type=int, default=16)
    ap.add_argument("--len-sf", type=int, default=20,
                    help="capture length per carrier, subframes")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--depth", type=int, default=2,
                    help="sweeps in flight (sustained mode)")
    ap.add_argument("--no-fused", action="store_true",
                    help="disable the r5 fused in-kernel detect reductions")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from lteax.phy.config import PhyConfig
    from lteax.phy.sync import pss_correlate
    from lteax.phy.seq import pss_sequence
    from lteax.phy.ofdm import subframe_to_samples

    cfg = PhyConfig(n_rb_dl=100)
    L = a.len_sf * cfg.n_samps_subframe
    rng = np.random.default_rng(0)
    # synthesize: noise + a PSS-bearing subframe per carrier
    x = (rng.standard_normal((a.carriers, L))
         + 1j * rng.standard_normal((a.carriers, L))).astype(np.complex64)
    x *= 0.1
    grid = np.zeros((cfg.n_sym_subframe, cfg.n_sc), np.complex64)
    k0 = cfg.n_sc // 2 - 31
    grid[6, k0:k0 + 62] = pss_sequence(1)
    # input building on host CPU (axon rejects eager dispatch)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sf = np.asarray(jax.jit(
            lambda g: subframe_to_samples(g, cfg), device=cpu)(
                jnp.asarray(grid[None])))[0]
    for c in range(a.carriers):
        off = 3000 + 977 * c
        x[c, off:off + len(sf)] += sf
    x_iq = np.stack([x.real, x.imag], -1).astype(np.float32)
    xd = jax.device_put(jnp.asarray(x_iq))

    from lteax.phy.sync import pss_time_filters
    from lteax.kernels.pss import pss_detect_pallas, pss_reduce_combine
    filt = np.asarray(pss_time_filters(cfg))
    use_fused = (not a.no_fused) and not a.cpu and \
        jax.default_backend() != "cpu"

    def detect(xi):
        s = (xi[..., 0] + 1j * xi[..., 1]).astype(jnp.complex64)
        if use_fused:
            # r5: the (C, 3, L) correlation tile reduces in-kernel — the
            # full array never touches HBM and the XLA reduction passes
            # disappear (VERDICT r4 item 5)
            nid2, idx, peak, mean = pss_reduce_combine(
                *pss_detect_pallas(s, filt))
            return nid2, idx, peak / jnp.maximum(mean, 1e-20)
        p = pss_correlate(s, cfg)                     # (C, 3, L)
        root_max = jnp.max(p, axis=-1)
        nid2 = jnp.argmax(root_max, axis=-1)
        pr = jnp.take_along_axis(p, nid2[:, None, None], axis=1)[:, 0, :]
        peak = jnp.max(pr, axis=-1)
        idx = jnp.argmax(pr, axis=-1)
        ratio = peak / jnp.maximum(jnp.mean(p, axis=(-2, -1)), 1e-20)
        return nid2, idx, ratio

    f = jax.jit(detect)
    t0 = time.time()
    nid2, idx, ratio = f(xd)
    nid2_h, idx_h = np.asarray(nid2), np.asarray(idx)
    print(f"compile+first {time.time()-t0:.1f}s; detected n_id_2="
          f"{nid2_h[:4]}... idx={idx_h[:4]}...", file=sys.stderr)
    assert (nid2_h == 1).all(), "PSS root misdetected"
    ts = []
    for _ in range(a.reps):
        t0 = time.perf_counter()
        np.asarray(f(xd)[2])  # transfer = reliable completion barrier
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"per-batch median {t*1e3:.1f} ms for {a.carriers}x{a.len_sf} sf",
          file=sys.stderr)
    # sustained: 2 sweeps in flight (hides the ~29 ms dispatch overhead,
    # as the stream-scan app drives it)
    inflight = []
    t0 = time.perf_counter()
    for _ in range(a.reps):
        inflight.append(f(xd))
        if len(inflight) > a.depth:
            np.asarray(inflight.pop(0)[2])
    for r in inflight:
        np.asarray(r[2])
    t_sus = (time.perf_counter() - t0) / a.reps
    print(f"sustained ({a.depth} in flight): {t_sus*1e3:.1f} ms/sweep",
          file=sys.stderr)
    t = min(t, t_sus)
    msps = a.carriers * L / t / 1e6
    print(json.dumps({
        "metric": "PSS cell-search sweep rate, 20 MHz carriers (3 roots)",
        "value": round(msps, 1), "unit": "Msps/chip",
        "vs_line_rate": round(msps / 30.72, 1)}))


if __name__ == "__main__":
    main()
