"""Stage breakdown for the UL (PUSCH) pipeline at bench shapes.

Times the front program (chest+eq+IDFT+demap+deinterleave+de-match) and
the turbo+CRC program separately, each with a device->host transfer as the
completion barrier, plus the chained pair — isolating where the UL batch
time goes (cf. bench/turbo_breakdown.py for the DL side).

    python bench/ul_breakdown.py [--batch 256] [--reps 5]
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=6)
    a = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from lteax.phy.channels import pusch
    from lteax.phy.channels.pdsch import pdsch_prepare_cbs
    from lteax.shard import pipeline as pl

    cid, sf, rnti = 214, 4, 0x3D
    alloc = pusch.PuschAlloc(n_prb=100, rb_start=0, mcs_tbs=75376, qm=6)
    geom = alloc.geom
    rng = np.random.default_rng(0)
    b = a.batch
    nv = 10 ** (-2.5)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        b_uniq = min(b, 8)
        tbs_bits = rng.integers(0, 2, size=(b_uniq, alloc.mcs_tbs)).astype(np.int32)
        grids = []
        for i in range(b_uniq):
            cbs = jnp.asarray(pdsch_prepare_cbs(tbs_bits[i], geom))
            g = pusch.pusch_encode_cbs(cbs, alloc, rnti, sf, cid)
            grids.append(pusch.pusch_add_dmrs(np.asarray(g), alloc, cid, sf))
        x = np.stack(grids)
    reps_t = b // b_uniq + (1 if b % b_uniq else 0)
    x = np.tile(x, (reps_t, 1, 1))[:b]
    x = x + (rng.standard_normal(x.shape)
             + 1j * rng.standard_normal(x.shape)) * np.sqrt(nv / 2)
    x_iq = np.stack([x.real, x.imag], -1).astype(np.float32)

    # build the two stages separately (mirrors make_pusch_batch_decoder)
    dec = pl.make_pusch_batch_decoder(alloc, rnti, sf, cid, n_iter=a.iters,
                                      noise_var=nv)
    xd = jax.device_put(jnp.asarray(x_iq))
    out = dec(xd)
    n_ok = int(np.sum(np.asarray(out[1])))
    print(f"warmup: crc ok {n_ok}/{b}", file=sys.stderr)

    def timed(label, fn, arg, barrier):
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            r = fn(arg)
            np.asarray(barrier(r))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) * 1e3
        print(f"{label:28s} {t:8.2f} ms")
        return t

    f1j, f2j = dec.stage_front, dec.stage_turbo
    d = f1j(xd)
    jax.block_until_ready(d)
    timed("front (chest..de-match)", f1j, xd, lambda r: r[0, 0, 0, :4])
    timed("turbo+CRC", f2j, d, lambda r: r[1])
    timed("chain (front+turbo)", dec, xd, lambda r: r[1])


if __name__ == "__main__":
    main()
