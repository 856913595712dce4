"""Stage-level profile of the 20 MHz DL decode front-end on the chip.

Times cumulative sub-pipelines with an inner repetition loop (dodges the
~20-30 ms dispatch floor): OFDM demod -> +chest/eq -> +demap ->
+descramble/de-match -> +turbo+CRC (full).

    python bench/front_profile.py [--batch 64] [--inner 8]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from lteax.phy.config import PhyConfig
    from lteax.phy import seq, chest
    from lteax.phy.grid import pdsch_flat_idx, make_flat_extractor
    from lteax.phy.ofdm import samples_to_subframe
    from lteax.phy.mod import demodulate_maxlog
    from lteax.phy.channels.pdsch import (_c_init, soft_dematch,
                                          pdsch_geometry, desegment_device)
    from lteax.phy.fec.crc import check_crc
    from lteax.phy.tables.tbs import get_tbs_for_mcs
    from lteax.kernels.turbo_mlm import turbo_decode_batch_pallas

    cfg = PhyConfig(n_rb_dl=100)
    cid, sf, rnti, cfi = 214, 1, 0x1234, 1
    prbs = tuple(range(100))
    tbs, scheme = get_tbs_for_mcs(28, 100)
    re_idx = pdsch_flat_idx(cfg, cid, cfi, prbs, sf)
    extract, _, _ = make_flat_extractor(re_idx, cfg.n_sym_subframe, cfg.n_sc)
    geom = pdsch_geometry(tbs, len(re_idx), 6, 0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((a.batch, cfg.n_samps_subframe, 2)) \
        .astype(np.float32)
    xd = jax.device_put(jnp.asarray(x))

    def ofdm(s_iq):
        s = (s_iq[..., 0] + 1j * s_iq[..., 1]).astype(jnp.complex64)
        return samples_to_subframe(s, cfg)

    def eq(s_iq):
        grid = ofdm(s_iq)
        h = chest.estimate_channel(grid, cfg, cid, sf, port=0)
        nv = chest.estimate_noise_var(grid, cfg, cid, sf)
        x_eq, eff = chest.equalize_siso(grid.reshape(-1), h.reshape(-1), nv)
        return extract(x_eq), extract(eff)

    def demap(s_iq):
        x_eq, eff = eq(s_iq)
        return demodulate_maxlog(x_eq, scheme, eff)

    def dematch(s_iq):
        llr = demap(s_iq)
        c = seq.gold_sequence(_c_init(rnti, sf, cid), geom.g)
        return soft_dematch(llr * (1.0 - 2.0 * c).astype(llr.dtype), geom)

    def full(s_iq):
        d_llr = jax.vmap(dematch)(s_iq)
        flat = d_llr.reshape(-1, 3, geom.k + 4)
        bits = turbo_decode_batch_pallas(flat, geom.k, n_iter=6, tb=16,
                                         acq=16, early_crc="24B")
        bits = bits.reshape(a.batch, geom.info.c, geom.k)
        payload, cb_ok = check_crc(bits, "24B")
        tb_full = desegment_device(payload, geom.info)
        tb, ok = check_crc(tb_full, "24A")
        return tb.sum() + ok.sum()

    stages = {
        "ofdm": lambda s: jax.vmap(ofdm)(s).real.sum(),
        "+chest/eq": lambda s: sum(v.real.sum() if jnp.iscomplexobj(v)
                                   else v.sum() for v in jax.vmap(eq)(s)),
        "+demap": lambda s: jax.vmap(demap)(s).sum(),
        "+dematch": lambda s: jax.vmap(dematch)(s).sum(),
        "full(+turbo+crc)": full,
    }
    prev = 0.0
    for name, fn in stages.items():
        def run(s, fn=fn):
            # optimization_barrier chains iterations so XLA cannot hoist
            # the loop-invariant body out of the fori_loop
            def body(i, acc):
                s_dep, acc = jax.lax.optimization_barrier((s, acc))
                return acc + fn(s_dep)
            return jax.lax.fori_loop(0, a.inner, body, jnp.float32(0.0))
        f = jax.jit(run)
        np.asarray(f(xd))
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            # np.asarray, not block_until_ready: on the axon backend
            # block_until_ready returns before remote execution completes
            # for small outputs — only a device->host transfer really waits
            np.asarray(f(xd))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) / a.inner * 1e3
        print(f"{name:18s} {t:8.2f} ms/batch({a.batch})  "
              f"(+{t - prev:6.2f} ms marginal)")
        prev = t


if __name__ == "__main__":
    main()
