"""Probe: 2x2 MIMO turbo convergence per codeword (the SIC pricing input).

Builds the MIMO bench batch, runs the production front once, then runs the
Pallas turbo stage at FIXED iteration counts (no early stop, no retry) and
reports per-codeblock CRC failure counts after each — split by codeword, so
the compact-vs-full-batch retry regime (NEXT.md r2 lesson) and the SIC
upside (codeword-1 failures that post-cancellation SINR would eliminate)
are both measurable before buying anything.

    python bench/mimo_iterprobe.py [--batch 192]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mimo_breakdown import build_inputs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from lteax.phy.fec.crc import check_crc
    from lteax.kernels.turbo_mlm import turbo_decode_batch_pallas
    from lteax.shard.pipeline import make_mimo_batch_decoder

    cfg, cid, sf, rnti, cfi, prbs, geom, scheme, x_iq = build_inputs(a, jax, jnp)
    xd = jax.device_put(jnp.asarray(x_iq))
    dec = make_mimo_batch_decoder(cfg, cid, cfi, prbs, sf, rnti, geom, scheme)
    d = dec.stage_front(xd)
    jax.block_until_ready(d)
    b = a.batch
    c2 = 2 * b * geom.info.c
    d_len = geom.k + 4
    print(f"front done: d_llr {tuple(d.shape)} -> {c2} codeblocks "
          f"({geom.info.c}/cw)", file=sys.stderr)

    win = int(os.environ.get("LTEAX_PALLAS_WIN", "128"))
    acq = int(os.environ.get("LTEAX_PALLAS_ACQ", "16"))
    for n_it in (1, 2, 3):
        def stage(d_llr, n_it=n_it):
            flat = d_llr.reshape(c2, 3, d_len)
            bits = turbo_decode_batch_pallas(flat, geom.k, n_iter=n_it,
                                             win=win, acq=acq, tb=16,
                                             mdtype="bf16", early_crc=None,
                                             retry_m=0)
            _, cb_ok = check_crc(bits.reshape(2 * b, geom.info.c, geom.k),
                                 "24B")
            return cb_ok
        f = jax.jit(stage)
        ok = np.asarray(f(d))                     # (2b, C) b-major (sf, cw)
        ok = ok.reshape(b, 2, geom.info.c)
        fail_cw = [int(np.sum(~ok[:, q])) for q in range(2)]
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(f(d))
            ts.append(time.perf_counter() - t0)
        print(f"fixed {n_it} iter: {np.median(ts)*1e3:7.2f} ms, "
              f"cb fails cw0={fail_cw[0]} cw1={fail_cw[1]} "
              f"(of {b * geom.info.c} each)")


if __name__ == "__main__":
    main()
