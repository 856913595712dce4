"""Second bisect round: which single restructure step costs ~35 ms.

Starts from the fast old-style front and changes ONE thing per variant:
  old          — baseline (4 chest calls, per-cw demap+de-match inside)
  batched-chest — chest called once per port with both RX rows batched
  joint-demap  — one demodulate_maxlog over both layers
  batch-dematch — de-match moved out of the vmapped front to batch level

    python bench/mimo_front_probe2.py [--batch 192]
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
    from lteax.phy.grid import pdsch_flat_idx
    from lteax.phy.ofdm import samples_to_subframe
    from lteax.phy.mod import demodulate_maxlog
    from lteax.phy.channels.pdsch import _c_init, soft_dematch

    cfg, cid, sf, rnti, cfi, prbs, geom, scheme, x_iq = build_inputs(a, jax, jnp)
    xd = jax.device_put(jnp.asarray(x_iq))
    re_idx = jnp.asarray(pdsch_flat_idx(cfg, cid, cfi, prbs, sf))
    sgn = jnp.asarray(np.stack(
        [seq.scrambling_symbols_np(_c_init(rnti, sf, cid, q), geom.g)
         for q in range(2)]))

    def demix(grids, h):
        nvar = chest.estimate_noise_var(grids[0], cfg, cid, sf)
        y = jnp.stack([grids[r].reshape(-1)[re_idx] for r in range(2)])
        return mimo.mmse_demix_2layers(y, mimo.heff_tm3(h), nvar)

    def ofdm(sub_iq):
        s = (sub_iq[..., 0] + 1j * sub_iq[..., 1]).astype(jnp.complex64)
        return jax.vmap(lambda ss: samples_to_subframe(ss, cfg))(s)

    def h_old(grids):
        return jnp.stack([jnp.stack([
            chest.estimate_channel(grids[r], cfg, cid, sf, port=t)
            .reshape(-1)[re_idx] for t in range(2)]) for r in range(2)])

    def h_batched(grids):
        return jnp.stack([chest.estimate_channel(
            grids, cfg, cid, sf, port=t).reshape(2, -1)[:, re_idx]
            for t in range(2)], axis=-2)

    def percw_tail(x_hat, eff):
        outs = []
        for q in range(2):
            llr = demodulate_maxlog(x_hat[q], scheme, eff[q])
            llr = (llr * sgn[q]).astype(jnp.bfloat16)
            outs.append(soft_dematch(llr, geom))
        return jnp.stack(outs)

    def joint_tail(x_hat, eff):
        llr = demodulate_maxlog(x_hat.reshape(-1), scheme, eff.reshape(-1))
        llr = (llr.reshape(2, geom.g) * sgn).astype(jnp.bfloat16)
        return jnp.stack([soft_dematch(llr[q], geom) for q in range(2)])

    def nodematch_tail(x_hat, eff):
        outs = []
        for q in range(2):
            llr = demodulate_maxlog(x_hat[q], scheme, eff[q])
            outs.append((llr * sgn[q]).astype(jnp.bfloat16))
        return jnp.stack(outs)

    def mk(h_fn, tail_fn):
        def front(sub_iq):
            grids = ofdm(sub_iq)
            x_hat, eff = demix(grids, h_fn(grids))
            return tail_fn(x_hat, eff)
        return front

    variants = {
        "old": lambda b: jax.vmap(mk(h_old, percw_tail), in_axes=1)(b),
        "batched-chest": lambda b: jax.vmap(mk(h_batched, percw_tail),
                                            in_axes=1)(b),
        "joint-demap": lambda b: jax.vmap(mk(h_old, joint_tail),
                                          in_axes=1)(b),
        "batch-dematch": lambda b: soft_dematch(
            jax.vmap(mk(h_old, nodematch_tail), in_axes=1)(b)
            .reshape(-1, geom.g), geom),
    }
    for name, fn in variants.items():
        f = jax.jit(fn)
        t0 = time.time()
        jax.block_until_ready(f(xd))
        compile_s = time.time() - t0
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(f(xd).reshape(-1)[:4])
            ts.append(time.perf_counter() - t0)
        print(f"{name:16s} {np.median(ts)*1e3:8.2f} ms  (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()


def main_combo():
    """Production-combo variants isolating the OFDM call style."""
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
    sgn = jnp.asarray(np.stack(
        [seq.scrambling_symbols_np(_c_init(rnti, sf, cid, q), geom.g)
         for q in range(2)]))

    def mk(vmap_ofdm):
        def front(sub_iq):
            s = (sub_iq[..., 0] + 1j * sub_iq[..., 1]).astype(jnp.complex64)
            if vmap_ofdm:
                grids = jax.vmap(lambda ss: samples_to_subframe(ss, cfg))(s)
            else:
                grids = samples_to_subframe(s, cfg)
            nvar = chest.estimate_noise_var(grids[0], cfg, cid, sf)
            h = jnp.stack([extract(chest.estimate_channel(
                grids, cfg, cid, sf, port=t).reshape(2, -1))
                for t in range(2)], axis=-2)
            y = extract(grids.reshape(2, -1))
            x_hat, eff = mimo.mmse_demix_2layers(y, mimo.heff_tm3(h), nvar)
            llr = demodulate_maxlog(x_hat.reshape(-1), scheme,
                                    eff.reshape(-1))
            return (llr.reshape(2, geom.g) * sgn).astype(jnp.bfloat16)
        return front

    for name, vm in (("combo, direct ofdm", False),
                     ("combo, inner-vmap ofdm", True)):
        fn = lambda b, vm=vm: soft_dematch(
            jax.vmap(mk(vm), in_axes=1)(b).reshape(-1, geom.g), geom)
        f = jax.jit(fn)
        t0 = time.time()
        jax.block_until_ready(f(xd))
        compile_s = time.time() - t0
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(f(xd).reshape(-1)[:4])
            ts.append(time.perf_counter() - t0)
        print(f"{name:26s} {np.median(ts)*1e3:8.2f} ms  (compile {compile_s:.0f}s)")
