"""Front-end cost breakdown at the headline config (B x 20 MHz subframes).

Times cumulative prefixes of the PDSCH receive front-end as separate jit
programs (each rep ends with a small device->host transfer barrier, see
PERF.md "Timing hazard"); consecutive differences give each stage's cost.
The common ~29 ms per-dispatch tunnel overhead cancels in the differences.

Usage: python bench/frontend_breakdown.py [--batch 384] [--reps 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def build_inputs(cfg, cid, sf, rnti, cfi, prbs, geom, scheme, b, tbs):
    from lteax.phy import seq
    from lteax.phy.grid import crs_flat_idx, crs_symbols, pdsch_flat_idx
    from lteax.phy.ofdm import subframe_to_samples
    from lteax.phy.channels import pdsch as pdsch_mod

    rng = np.random.default_rng(0)
    b_uniq = min(b, 32)
    tb_bits = rng.integers(0, 2, size=(b_uniq, tbs)).astype(np.int32)
    re_idx = pdsch_flat_idx(cfg, cid, cfi, prbs, sf)
    crs_idx = crs_flat_idx(cfg, cid, 0)
    vals = []
    for sym in crs_symbols(0, cfg):
        slot = sym // cfg.n_sym_slot
        vals.append(seq.crs_values(cid, 2 * sf + slot, sym % cfg.n_sym_slot,
                                   cfg.n_rb_dl))
    crs_vals = np.concatenate(vals)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cbs = np.stack([pdsch_mod.pdsch_prepare_cbs(tb_bits[i], geom)
                        for i in range(b_uniq)])
        enc = jax.jit(jax.vmap(lambda cb: pdsch_mod.pdsch_encode_cbs(
            cb, geom, rnti, sf, cid, scheme)), device=cpu)
        syms = np.asarray(enc(jnp.asarray(cbs)))
        grids = np.zeros((b_uniq, cfg.n_sym_subframe * cfg.n_sc),
                         dtype=np.complex64)
        grids[:, crs_idx] = crs_vals
        grids[:, re_idx] = syms
        x = np.asarray(subframe_to_samples(jnp.asarray(
            grids.reshape(b_uniq, cfg.n_sym_subframe, cfg.n_sc)), cfg))
    x = np.tile(x, (b // b_uniq + (1 if b % b_uniq else 0), 1))[:b]
    nv = 10 ** (-25 / 10)
    x = x + (rng.standard_normal(x.shape)
             + 1j * rng.standard_normal(x.shape)) * np.sqrt(nv / 2)
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--reps", type=int, default=7)
    a = ap.parse_args()

    from lteax.phy.config import PhyConfig
    from lteax.phy import chest, seq
    from lteax.phy.grid import pdsch_flat_idx, make_flat_extractor
    from lteax.phy.ofdm import samples_to_subframe
    from lteax.phy.mod import demodulate_maxlog
    from lteax.phy.channels import pdsch as pdsch_mod
    from lteax.phy.channels.pdsch import _c_init, soft_dematch
    from lteax.phy.tables.tbs import get_tbs_for_mcs
    from lteax.io.iq import to_iq_f32

    cfg = PhyConfig(n_rb_dl=100)
    cid, sf, rnti, mcs, cfi = 214, 1, 0x1234, 28, 1
    prbs = tuple(range(100))
    tbs, scheme = get_tbs_for_mcs(mcs, 100)
    re_idx = pdsch_flat_idx(cfg, cid, cfi, prbs, sf)
    geom = pdsch_mod.pdsch_geometry(tbs, len(re_idx), 6, 0)
    extract, _, _ = make_flat_extractor(re_idx, cfg.n_sym_subframe, cfg.n_sc)
    sgn = jnp.asarray(seq.scrambling_symbols_np(
        _c_init(rnti, sf, cid), geom.g))

    print(f"building {a.batch} subframes...", file=sys.stderr)
    x = build_inputs(cfg, cid, sf, rnti, cfi, prbs, geom, scheme, a.batch, tbs)
    xd = jax.device_put(jnp.asarray(to_iq_f32(x)))

    def to_cplx(s_iq):
        return (s_iq[..., 0].astype(jnp.float32)
                + 1j * s_iq[..., 1].astype(jnp.float32)).astype(jnp.complex64)

    def p0_read(s_iq):
        return jnp.sum(s_iq, axis=(-2, -1))

    def p1_cplx(s_iq):
        s = to_cplx(s_iq)
        return jnp.sum(jnp.real(s) + jnp.imag(s), axis=-1)

    def p2_ofdm(s_iq):
        g = jax.vmap(lambda s: samples_to_subframe(s, cfg))(to_cplx(s_iq))
        return jnp.sum(jnp.abs(g) ** 2, axis=(-2, -1))

    def _front_to(stage):
        def f(s_iq):
            def one(samples):
                grid = samples_to_subframe(samples, cfg)
                h = chest.estimate_channel(grid, cfg, cid, sf, port=0)
                nv = chest.estimate_noise_var(grid, cfg, cid, sf)
                if stage == "chest":
                    return jnp.sum(jnp.abs(h) ** 2) + nv
                x_eq, eff_nv = chest.equalize_siso(
                    grid.reshape(-1), h.reshape(-1), nv)
                if stage == "eq":
                    return jnp.sum(jnp.abs(x_eq) ** 2) + jnp.sum(eff_nv)
                llr = demodulate_maxlog(extract(x_eq), scheme, extract(eff_nv))
                return jnp.sum(llr * sgn)
            return jax.vmap(one)(to_cplx(s_iq))
        return f

    def p6_full(s_iq):
        def one(samples):
            grid = samples_to_subframe(samples, cfg)
            h = chest.estimate_channel(grid, cfg, cid, sf, port=0)
            nv = chest.estimate_noise_var(grid, cfg, cid, sf)
            x_eq, eff_nv = chest.equalize_siso(grid.reshape(-1), h.reshape(-1), nv)
            llr = demodulate_maxlog(extract(x_eq), scheme, extract(eff_nv))
            return llr * sgn
        llr = jax.vmap(one)(to_cplx(s_iq)).astype(jnp.bfloat16)
        d = soft_dematch(llr, geom)
        return jnp.sum(d.astype(jnp.float32), axis=(-3, -2, -1))

    # ---- PRODUCTION (Pallas demap) front stages ----
    from lteax.kernels.demap import demap_descr_planar_pallas, planar_sgn_np
    from lteax.phy.channels.pdsch import soft_dematch_planar
    qm = geom.qm
    npad = -(-(geom.g // qm) // 128) * 128
    sgnp = jnp.asarray(planar_sgn_np(
        int(rnti) * 2 ** 14 + int(sf) * 512 + int(cid), geom.g, qm, npad))

    def _eq_xr(s_iq):
        def one(samples):
            grid = samples_to_subframe(samples, cfg)
            h = chest.estimate_channel(grid, cfg, cid, sf, port=0)
            nv = chest.estimate_noise_var(grid, cfg, cid, sf)
            hf = h.reshape(-1)
            p = jnp.abs(hf) ** 2
            x = grid.reshape(-1) * jnp.conj(hf) / (p + nv)
            x = x / jnp.maximum(p / (p + nv), 1e-12)
            return (extract(jnp.real(x)), extract(jnp.imag(x)),
                    extract(p / nv))
        return jax.vmap(one)(to_cplx(s_iq))

    def pk_eq(s_iq):
        xr, xi, invnv = _eq_xr(s_iq)
        return jnp.sum(xr + xi + invnv, axis=-1)

    def pk_demap(s_iq):
        xr, xi, invnv = _eq_xr(s_iq)
        llr = demap_descr_planar_pallas(xr, xi, invnv, sgnp, scheme)
        return jnp.sum(llr.astype(jnp.float32), axis=(-2, -1))

    def pk_full(s_iq):
        xr, xi, invnv = _eq_xr(s_iq)
        llr = demap_descr_planar_pallas(xr, xi, invnv, sgnp, scheme)
        d = soft_dematch_planar(llr, geom, npad)
        return jnp.sum(d.astype(jnp.float32), axis=(-3, -2, -1))

    stages = [
        ("input read (sum f32 pairs)", p0_read),
        ("+ complex conversion", p1_cplx),
        ("+ OFDM demod (FFT)", p2_ofdm),
        ("+ CRS chest + noisevar", _front_to("chest")),
        ("+ MMSE equalize", _front_to("eq")),
        ("+ extract + 64QAM demap + descramble", _front_to("demap")),
        ("+ bf16 + rate de-match (XLA full front)", p6_full),
        ("[prod] eq + extract xr/xi/invnv", pk_eq),
        ("[prod] + Pallas fused demap", pk_demap),
        ("[prod] + planar de-match (full front)", pk_full),
    ]

    prev = None
    for name, fn in stages:
        f = jax.jit(fn)
        out = f(xd)
        np.asarray(out)   # warmup + compile
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(f(xd))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) * 1e3
        delta = "" if prev is None else f"  (+{med - prev:7.2f} ms)"
        print(f"{name:42s} {med:8.2f} ms{delta}", file=sys.stderr)
        prev = med


if __name__ == "__main__":
    main()
