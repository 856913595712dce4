"""Stage breakdown for the 2x2 TM3 MIMO pipeline at bench shapes.

Times the front program (OFDM x2 rx + per-(rx,port) chest + MMSE demix +
demap + de-match) and the turbo+CRC program separately (device->host
transfer as the barrier), for both chest modes (LTEAX_MIMO_CHEST=ls|mmse).

    python bench/mimo_breakdown.py [--batch 192] [--reps 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_inputs(a, jax, jnp):
    from lteax.phy.config import PhyConfig
    from lteax.phy import seq, mimo
    from lteax.phy.grid import crs_flat_idx, crs_symbols, pdsch_flat_idx
    from lteax.phy.ofdm import subframe_to_samples
    from lteax.phy.channels import pdsch as pdsch_mod
    from lteax.phy.tables.tbs import get_tbs_for_mcs

    cfg = PhyConfig(n_rb_dl=100, n_ant=2)
    cid, sf, rnti, cfi = 214, 1, 0x1234, 1
    prbs = tuple(range(100))
    tbs, scheme = get_tbs_for_mcs(28, 100)
    re_idx_np = pdsch_flat_idx(cfg, cid, cfi, prbs, sf)
    geom = pdsch_mod.pdsch_geometry(tbs, len(re_idx_np), 6, 0)
    b = a.batch
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    b_uniq = min(b, 8)
    tb_bits = rng.integers(0, 2, size=(2, b_uniq, tbs)).astype(np.int32)
    with jax.default_device(cpu):
        d = [jax.vmap(lambda cb, q=q: pdsch_mod.pdsch_encode_cbs(
                cb, geom, rnti, sf, cid, scheme, codeword=q))(
                jnp.asarray(np.stack([pdsch_mod.pdsch_prepare_cbs(
                    tb_bits[q, i], geom) for i in range(b_uniq)])))
             for q in range(2)]
        p0, p1 = mimo.precode_tm3(mimo.layer_map_2cw(d[0], d[1]))
        ports = np.zeros((2, b_uniq, cfg.n_sym_subframe * cfg.n_sc),
                         np.complex64)
        for p in range(2):
            vals = []
            for sym in crs_symbols(p, cfg):
                slot = sym // cfg.n_sym_slot
                vals.append(seq.crs_values(cid, 2 * sf + slot,
                                           sym % cfg.n_sym_slot,
                                           cfg.n_rb_dl))
            ports[p][:, crs_flat_idx(cfg, cid, p)] = np.concatenate(vals)
        ports[0][:, re_idx_np] = np.asarray(p0)
        ports[1][:, re_idx_np] = np.asarray(p1)
        tx = np.stack([np.asarray(subframe_to_samples(jnp.asarray(
            ports[p].reshape(b_uniq, cfg.n_sym_subframe, cfg.n_sc)), cfg))
            for p in range(2)])
    cmat = np.array([[1.0 + 0.1j, 0.3 - 0.25j],
                     [0.2 + 0.3j, -0.95 + 0.1j]], np.complex64)
    nv = 10 ** (-2.5)
    rx = np.einsum("rt,tbn->rbn", cmat, tx)
    rx = rx + (rng.standard_normal(rx.shape)
               + 1j * rng.standard_normal(rx.shape)) * np.sqrt(nv / 2)
    reps_t = b // b_uniq + (1 if b % b_uniq else 0)
    rx = np.tile(rx, (1, reps_t, 1))[:, :b]
    x_iq = np.stack([rx.real, rx.imag], -1).astype(np.float32)
    return cfg, cid, sf, rnti, cfi, prbs, geom, scheme, x_iq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from lteax.shard.pipeline import make_mimo_batch_decoder
    cfg, cid, sf, rnti, cfi, prbs, geom, scheme, x_iq = build_inputs(a, jax, jnp)
    xd = jax.device_put(jnp.asarray(x_iq))

    def timed(label, fn, arg, barrier):
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(barrier(fn(arg)))
            ts.append(time.perf_counter() - t0)
        print(f"{label:34s} {np.median(ts)*1e3:8.2f} ms")

    for mode in ("ls", "mmse"):
        os.environ["LTEAX_MIMO_CHEST"] = mode
        dec = make_mimo_batch_decoder(cfg, cid, cfi, prbs, sf, rnti, geom,
                                      scheme)
        out = dec(xd)
        n_ok = int(np.sum(np.asarray(out[1])))
        print(f"[chest={mode}] warmup crc ok {n_ok}/{2*a.batch}")
        d = dec.stage_front(xd)
        jax.block_until_ready(d)
        timed(f"[{mode}] front", dec.stage_front, xd,
              lambda r: r[0, 0, 0, :4])
        timed(f"[{mode}] turbo+CRC", dec.stage_turbo, d, lambda r: r[1])
        timed(f"[{mode}] chain", dec, xd, lambda r: r[1])


if __name__ == "__main__":
    main()
