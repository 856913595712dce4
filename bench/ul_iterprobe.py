"""Probe: UL turbo convergence + fixed-iteration cost vs the DL equivalent.

Builds the UL (PUSCH) bench batch, runs the front once, then times the
Pallas turbo stage at FIXED iteration counts (no early stop, no retry) and
reports per-codeblock CRC pass counts after each — separating "UL LLRs
converge slower" from "UL turbo stage is structurally slower".

    python bench/ul_iterprobe.py [--batch 384]
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
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from lteax.phy.channels import pusch
    from lteax.phy.channels.pdsch import pdsch_prepare_cbs
    from lteax.phy.fec.crc import check_crc
    from lteax.kernels.turbo_mlm import turbo_decode_batch_pallas
    from lteax.shard.pipeline import make_pusch_batch_decoder

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

    dec = make_pusch_batch_decoder(alloc, rnti, sf, cid, noise_var=nv)
    xd = jax.device_put(jnp.asarray(x_iq))
    d = dec.stage_front(xd)
    jax.block_until_ready(d)
    d_len = geom.k + 4
    c = b * geom.info.c
    print(f"front done: d_llr {tuple(d.shape)} -> {c} codeblocks", file=sys.stderr)

    win = int(os.environ.get("LTEAX_PALLAS_WIN", "128"))
    acq = int(os.environ.get("LTEAX_PALLAS_ACQ", "16"))
    for n_it in (1, 2):
        def stage(d_llr, n_it=n_it):
            flat = d_llr.reshape(c, 3, d_len)
            bits = turbo_decode_batch_pallas(flat, geom.k, n_iter=n_it,
                                             win=win, acq=acq, tb=16,
                                             mdtype="bf16", early_crc=None)
            _, cb_ok = check_crc(bits.reshape(b, geom.info.c, geom.k), "24B")
            return cb_ok
        f = jax.jit(stage)
        ok = f(d)
        n_ok = int(np.sum(np.asarray(ok)))
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(f(d))
            ts.append(time.perf_counter() - t0)
        print(f"fixed n_iter={n_it}: {np.median(ts)*1e3:8.2f} ms  "
              f"cb_ok {n_ok}/{c}  (fail {c - n_ok})")


if __name__ == "__main__":
    main()
