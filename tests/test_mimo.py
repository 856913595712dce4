"""2x2 spatial multiplexing: TM3/TM4 precoding + MMSE demix + DCI 2/2A.

(reference capability boundary: liblte_phy implements TX diversity only;
spatial multiplexing extends beyond the reference — tested against its own
encode path plus AWGN over random per-RE 2x2 channels.)"""

import numpy as np
import jax.numpy as jnp
import pytest

from lteax.phy import mimo
from lteax.phy.channels import pdsch as pdsch_mod
from lteax.phy.mod import modulate, demodulate_maxlog


def _rand_channel(rng, n_rx, n_tx, m, corr_len=24):
    """Smooth random per-RE channel (n_rx, n_tx, m)."""
    taps = (rng.standard_normal((n_rx, n_tx, m // corr_len + 2))
            + 1j * rng.standard_normal((n_rx, n_tx, m // corr_len + 2)))
    idx = np.arange(m) / corr_len
    lo = np.floor(idx).astype(int)
    frac = idx - lo
    h = taps[..., lo] * (1 - frac) + taps[..., lo + 1] * frac
    return (h / np.sqrt(2)).astype(np.complex64)


@pytest.mark.parametrize("mode,cb", [("tm3", None), ("tm4", 1), ("tm4", 2),
                                     ("tm4", 0)])
def test_precode_demix_noiseless(mode, cb):
    rng = np.random.default_rng(5)
    m = 480
    x = (rng.standard_normal((2, m)) + 1j * rng.standard_normal((2, m))
         ).astype(np.complex64)
    h = _rand_channel(rng, 2, 2, m)
    xj = jnp.asarray(x)
    if mode == "tm3":
        p0, p1 = mimo.precode_tm3(xj)
        heff = mimo.heff_tm3(jnp.asarray(h))
    else:
        p0, p1 = mimo.precode_tm4(xj, cb)
        heff = mimo.heff_tm4(jnp.asarray(h), cb)
    y = jnp.stack([h[r, 0] * p0 + h[r, 1] * p1 for r in range(2)])
    x_hat, eff = mimo.mmse_demix_2layers(y, heff, 1e-7)
    # random 2x2 channels have near-singular REs; check the typical case
    # tightly and the worst case loosely
    err = np.abs(np.asarray(x_hat - xj))
    assert float(np.median(err)) < 1e-4
    assert float(err.max()) < 0.05
    assert float(np.median(np.asarray(eff))) < 1e-4


@pytest.mark.parametrize("mode,cb,schemes", [
    ("tm3", None, ("qpsk", "16qam")),
    ("tm4", 1, ("16qam", "16qam")),
    ("tm4", 2, ("qpsk", "qpsk")),
])
@pytest.mark.heavy
def test_two_codeword_pdsch_over_2x2(mode, cb, schemes):
    """Full 2-codeword chain: encode (per-codeword scrambling) -> layer map
    -> precode -> random 2x2 channel + AWGN -> MMSE demix -> per-layer
    demap -> decode both TBs."""
    rng = np.random.default_rng(9)
    cid, sf, rnti = 214, 3, 0x1234
    n_re = 2040
    qm = {"qpsk": 2, "16qam": 4}
    tbs = (1736, 2856)
    geoms = [pdsch_mod.pdsch_geometry(tbs[q], n_re, qm[schemes[q]], 0)
             for q in range(2)]
    tb_bits = [rng.integers(0, 2, size=t).astype(np.int32) for t in tbs]
    d = [pdsch_mod.pdsch_encode(tb_bits[q], geoms[q], rnti, sf, cid,
                                schemes[q], codeword=q) for q in range(2)]
    x = mimo.layer_map_2cw(d[0], d[1])
    if mode == "tm3":
        p0, p1 = mimo.precode_tm3(x)
    else:
        p0, p1 = mimo.precode_tm4(x, cb)
    h = _rand_channel(rng, 2, 2, n_re)
    nv = 10 ** (-22 / 10)
    noise = (rng.standard_normal((2, n_re))
             + 1j * rng.standard_normal((2, n_re))) * np.sqrt(nv / 2)
    y = jnp.asarray(h[:, 0]) * p0[None] + jnp.asarray(h[:, 1]) * p1[None] \
        + jnp.asarray(noise.astype(np.complex64))
    heff = (mimo.heff_tm3(jnp.asarray(h)) if mode == "tm3"
            else mimo.heff_tm4(jnp.asarray(h), cb))
    x_hat, eff = mimo.mmse_demix_2layers(y, heff, nv)
    for q in range(2):
        llr = demodulate_maxlog(x_hat[q], schemes[q], eff[q])
        tb, ok, cb_oks = pdsch_mod.pdsch_decode_llrs(
            llr, geoms[q], rnti, sf, cid, codeword=q)
        assert ok, (mode, cb, q)
        np.testing.assert_array_equal(tb, tb_bits[q])


def test_codeword_scrambling_distinct():
    """Codeword 1 must use a different scrambling sequence (c_init q-term):
    decoding cw1 data as cw0 must fail CRC."""
    rng = np.random.default_rng(3)
    geom = pdsch_mod.pdsch_geometry(1736, 2040, 2, 0)
    tb = rng.integers(0, 2, size=1736).astype(np.int32)
    d = pdsch_mod.pdsch_encode(tb, geom, 0x55, 2, 100, "qpsk", codeword=1)
    llr = demodulate_maxlog(d, "qpsk", 0.05)
    _, ok_right, _ = pdsch_mod.pdsch_decode_llrs(llr, geom, 0x55, 2, 100,
                                                 codeword=1)
    _, ok_wrong, _ = pdsch_mod.pdsch_decode_llrs(llr, geom, 0x55, 2, 100,
                                                 codeword=0)
    assert ok_right and not ok_wrong


def test_dci_2_2a_roundtrip_and_blind_decode():
    from lteax.phy.channels.dci import (Dci2, Dci2A, dci_2_pack, dci_2_size,
                                        dci_2_unpack, dci_2a_pack,
                                        dci_2a_size, dci_2a_unpack,
                                        dci_1_size, prbs_to_rbg_bitmap)
    from lteax.phy.channels import pdcch
    from lteax.phy.config import PhyConfig
    for n_rb in (6, 25, 50, 100):
        bm = prbs_to_rbg_bitmap([0, 1], n_rb)
        da = Dci2A(rbg_bitmap=bm, mcs0=9, mcs1=12, rv0=1, rv1=2, ndi0=1,
                   harq=5, tpc=3, swap=1)
        bits = dci_2a_pack(da, n_rb)
        assert len(bits) == dci_2a_size(n_rb)
        assert dci_2a_unpack(bits, n_rb) == da
        d2 = Dci2(rbg_bitmap=bm, mcs0=4, mcs1=4, precoding=2)
        bits2 = dci_2_pack(d2, n_rb)
        assert dci_2_unpack(bits2, n_rb) == d2
        # sizes unambiguous vs 1A and not in the forbidden set
        from lteax.phy.channels.dci import AMBIGUOUS_SIZES, dci_1a_size
        for sz in (dci_2a_size(n_rb), dci_2_size(n_rb)):
            assert sz != dci_1a_size(n_rb) and sz not in AMBIGUOUS_SIZES
    # blind decode through the PDCCH path (common search space)
    cfg = PhyConfig(n_rb_dl=25)
    cid, cfi, ng, sf, rnti = 214, 3, 1.0, 2, 0x3D
    ncce = pdcch.n_cce(cfg, cid, cfi, ng)
    bm = prbs_to_rbg_bitmap([1, 4, 7], 25)
    d = Dci2A(rbg_bitmap=bm, mcs0=10, mcs1=6, rv1=3)
    sym = pdcch.pdcch_encode([(dci_2a_pack(d, 25), rnti, 0, 4)], cfg, cid,
                             cfi, ng, sf)[0]
    llr = demodulate_maxlog(sym, "qpsk")
    logical = pdcch.pdcch_llrs_to_logical(llr, cfg, cid, cfi, ng, sf)
    found = pdcch.pdcch_blind_decode_2a(logical, 25, rnti, ncce)
    assert found and found[0][0] == d


@pytest.mark.heavy
def test_tm3_full_subframe_ofdm_chest():
    """OFDM-level 2x2 TM3 integration: per-port grids with CRS, IFFT to
    samples, per-(rx,tx) flat channel + AWGN, FFT back, CRS channel
    estimation per (rx, port), MMSE demix at the PDSCH REs, dual-TB decode."""
    from lteax.phy.config import PhyConfig
    from lteax.phy import seq, chest
    from lteax.phy.grid import crs_flat_idx, crs_symbols, pdsch_flat_idx
    from lteax.phy.ofdm import subframe_to_samples, samples_to_subframe
    from lteax.phy.tables.tbs import get_tbs_for_mcs

    rng = np.random.default_rng(21)
    cfg = PhyConfig(n_rb_dl=25, n_ant=2)
    cid, sf, rnti, cfi = 214, 3, 0x1234, 2
    prbs = tuple(range(25))
    re_idx = pdsch_flat_idx(cfg, cid, cfi, prbs, sf)
    m = len(re_idx)
    tbs0, sch0 = get_tbs_for_mcs(12, 25)       # 16qam
    tbs1, sch1 = get_tbs_for_mcs(6, 25)        # qpsk
    g0 = pdsch_mod.pdsch_geometry(tbs0, m, 4, 0)
    g1 = pdsch_mod.pdsch_geometry(tbs1, m, 2, 0)
    tb0 = rng.integers(0, 2, size=tbs0).astype(np.int32)
    tb1 = rng.integers(0, 2, size=tbs1).astype(np.int32)
    d0 = pdsch_mod.pdsch_encode(tb0, g0, rnti, sf, cid, sch0, codeword=0)
    d1 = pdsch_mod.pdsch_encode(tb1, g1, rnti, sf, cid, sch1, codeword=1)
    p0, p1 = mimo.precode_tm3(mimo.layer_map_2cw(d0, d1))

    ports = [np.zeros(cfg.n_sym_subframe * cfg.n_sc, np.complex64)
             for _ in range(2)]
    for p in range(2):
        vals = []
        for sym in crs_symbols(p, cfg):
            slot = sym // cfg.n_sym_slot
            vals.append(seq.crs_values(cid, 2 * sf + slot,
                                       sym % cfg.n_sym_slot, cfg.n_rb_dl))
        ports[p][crs_flat_idx(cfg, cid, p)] = np.concatenate(vals)
    ports[0][re_idx] = np.asarray(p0)
    ports[1][re_idx] = np.asarray(p1)

    tx = [np.asarray(subframe_to_samples(
        jnp.asarray(g.reshape(cfg.n_sym_subframe, cfg.n_sc)), cfg))
        for g in ports]
    c = np.array([[1.0 + 0.1j, 0.45 - 0.30j],
                  [0.25 + 0.50j, -0.85 + 0.2j]], np.complex64)
    nv = 10 ** (-23 / 10)
    rx_grids, h_est = [], np.empty((2, 2, m), np.complex64)
    for r in range(2):
        y = c[r, 0] * tx[0] + c[r, 1] * tx[1]
        y = y + (rng.standard_normal(y.shape)
                 + 1j * rng.standard_normal(y.shape)).astype(np.complex64) \
            * np.sqrt(nv / 2)
        grid_r = samples_to_subframe(jnp.asarray(y), cfg)
        rx_grids.append(grid_r)
        for t in range(2):
            h = chest.estimate_channel(grid_r, cfg, cid, sf, port=t)
            h_est[r, t] = np.asarray(h.reshape(-1)[re_idx])
    yre = jnp.stack([g.reshape(-1)[re_idx] for g in rx_grids])
    heff = mimo.heff_tm3(jnp.asarray(h_est))
    x_hat, eff = mimo.mmse_demix_2layers(yre, heff, nv)
    for q, (gq, sq, tbq) in enumerate(((g0, sch0, tb0), (g1, sch1, tb1))):
        llr = demodulate_maxlog(x_hat[q], sq, eff[q])
        tb, ok, _ = pdsch_mod.pdsch_decode_llrs(llr, gq, rnti, sf, cid,
                                                codeword=q)
        assert ok, f"codeword {q} CRC failed"
        np.testing.assert_array_equal(tb, tbq)
