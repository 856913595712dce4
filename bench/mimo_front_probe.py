"""Bisect the 2x2 MIMO front-end cost: which restructure step regressed.

Variants (front only, no turbo):
  new      — production front (batched chest, structured extract)
  gather   — production front but flat re_idx gathers instead of extract
  old      — round-1 inline front (per-rx vmap OFDM, 4 chest calls,
             re_idx gathers, per-codeword demap/de-match)

    python bench/mimo_front_probe.py [--batch 192] [--reps 5]
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
    from lteax.phy import chest, mimo, seq
    from lteax.phy.grid import pdsch_flat_idx, make_flat_extractor
    from lteax.phy.ofdm import samples_to_subframe
    from lteax.phy.mod import demodulate_maxlog
    from lteax.phy.channels.pdsch import _c_init, soft_dematch

    cfg, cid, sf, rnti, cfi, prbs, geom, scheme, x_iq = build_inputs(a, jax, jnp)
    xd = jax.device_put(jnp.asarray(x_iq))
    re_idx_np = pdsch_flat_idx(cfg, cid, cfi, prbs, sf)
    extract, _, _ = make_flat_extractor(re_idx_np, cfg.n_sym_subframe,
                                        cfg.n_sc)
    re_idx = jnp.asarray(re_idx_np)
    sgn = jnp.asarray(np.stack(
        [seq.scrambling_symbols_np(_c_init(rnti, sf, cid, q), geom.g)
         for q in range(2)]))

    def tail(x_hat, eff):
        llr = demodulate_maxlog(x_hat.reshape(-1), scheme, eff.reshape(-1))
        llr = llr.reshape(2, geom.g) * sgn
        return llr.astype(jnp.bfloat16)

    def front_new(sub_iq):
        s = (sub_iq[..., 0] + 1j * sub_iq[..., 1]).astype(jnp.complex64)
        grids = samples_to_subframe(s, cfg)
        nvar = chest.estimate_noise_var(grids[0], cfg, cid, sf)
        h = jnp.stack([extract(chest.estimate_channel(
            grids, cfg, cid, sf, port=t).reshape(2, -1))
            for t in range(2)], axis=-2)
        y = extract(grids.reshape(2, -1))
        x_hat, eff = mimo.mmse_demix_2layers(y, mimo.heff_tm3(h), nvar)
        return tail(x_hat, eff)

    def front_gather(sub_iq):
        s = (sub_iq[..., 0] + 1j * sub_iq[..., 1]).astype(jnp.complex64)
        grids = samples_to_subframe(s, cfg)
        nvar = chest.estimate_noise_var(grids[0], cfg, cid, sf)
        h = jnp.stack([chest.estimate_channel(
            grids, cfg, cid, sf, port=t).reshape(2, -1)[:, re_idx]
            for t in range(2)], axis=-2)
        y = grids.reshape(2, -1)[:, re_idx]
        x_hat, eff = mimo.mmse_demix_2layers(y, mimo.heff_tm3(h), nvar)
        return tail(x_hat, eff)

    def front_old(sub_iq):
        s = (sub_iq[..., 0] + 1j * sub_iq[..., 1]).astype(jnp.complex64)
        grids = jax.vmap(lambda ss: samples_to_subframe(ss, cfg))(s)
        h = jnp.stack([jnp.stack([
            chest.estimate_channel(grids[r], cfg, cid, sf, port=t)
            .reshape(-1)[re_idx] for t in range(2)]) for r in range(2)])
        nvar = chest.estimate_noise_var(grids[0], cfg, cid, sf)
        y = jnp.stack([grids[r].reshape(-1)[re_idx] for r in range(2)])
        x_hat, eff = mimo.mmse_demix_2layers(y, mimo.heff_tm3(h), nvar)
        outs = []
        for q in range(2):
            llr = demodulate_maxlog(x_hat[q], scheme, eff[q])
            llr = (llr * sgn[q]).astype(jnp.bfloat16)
            outs.append(soft_dematch(llr, geom))
        return jnp.stack(outs)

    variants = {
        "new (extract, batch dematch)":
            lambda b: soft_dematch(jax.vmap(front_new, in_axes=1)(b)
                                   .reshape(-1, geom.g), geom),
        "gather, batch dematch":
            lambda b: soft_dematch(jax.vmap(front_gather, in_axes=1)(b)
                                   .reshape(-1, geom.g), geom),
        "old (gather, per-cw dematch)":
            lambda b: jax.vmap(front_old, in_axes=1)(b),
    }
    for name, fn in variants.items():
        f = jax.jit(fn)
        t0 = time.time()
        r = f(xd)
        jax.block_until_ready(r)
        compile_s = time.time() - t0
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(f(xd).reshape(-1)[:4])
            ts.append(time.perf_counter() - t0)
        print(f"{name:32s} {np.median(ts)*1e3:8.2f} ms  "
              f"(compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
