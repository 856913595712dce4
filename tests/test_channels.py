"""Physical-channel codec loopbacks (bit level, no OFDM)."""

import numpy as np
import jax.numpy as jnp

from lteax.phy.config import PhyConfig
from lteax.phy.channels import pbch, pcfich, pdcch, pdsch
from lteax.phy.channels.dci import (Dci1A, dci_1a_pack, dci_1a_unpack,
                                    riv_encode, riv_decode, dci_1a_size)
from lteax.phy.mod import demodulate_maxlog
from lteax.phy.tables.tbs import get_tbs_for_mcs

CFG = PhyConfig(n_rb_dl=6)
NID = 214


def test_pbch_loopback_all_ant_and_quarters():
    rng = np.random.default_rng(0)
    mib = rng.integers(0, 2, size=24).astype(np.int32)
    for n_ant in (1, 2):
        quarters = np.asarray(pbch.pbch_encode_40ms(jnp.asarray(mib), n_ant, NID))
        for q in range(4):
            # LLRs straight from bits (perfect channel)
            llr = (1.0 - 2.0 * quarters[q]).astype(np.float32) * 5.0
            got, ant, qq, ok = pbch.pbch_blind_decode({1: llr, 2: llr, 4: llr},
                                                      NID)
            # note: with perfect llrs the first passing hypothesis must be
            # the true (ant, q)
            assert ok
            assert ant == n_ant and qq == q
            np.testing.assert_array_equal(got, mib)


def test_pcfich_loopback():
    for sf in (0, 3):
        for cfi in (1, 2, 3):
            sym = pcfich.pcfich_encode(cfi, NID, sf)
            llr = demodulate_maxlog(sym, "qpsk")
            got, _ = pcfich.pcfich_decode(llr, NID, sf)
            assert int(got) == cfi


def test_riv_roundtrip():
    for n_rb in (6, 25, 50, 100):
        for start in range(0, n_rb, 3):
            for l in range(1, n_rb - start + 1, 2):
                riv = riv_encode(n_rb, start, l)
                s2, l2 = riv_decode(n_rb, riv)
                assert (s2, l2) == (start, l), (n_rb, start, l, riv, s2, l2)


def test_dci_1a_roundtrip():
    d = Dci1A(rb_start=0, l_crb=6, mcs=5, rv=1, tpc=1)
    for n_rb in (6, 50):
        bits = dci_1a_pack(d, n_rb)
        assert len(bits) == dci_1a_size(n_rb)
        back = dci_1a_unpack(bits, n_rb)
        assert back is not None
        assert (back.rb_start, back.l_crb, back.mcs, back.rv) == (0, 6, 5, 1)
        assert back.n_prb_1a == 3


def test_pdcch_loopback():
    cfg = CFG
    ng = 1.0
    cfi = 3
    sf = 5
    si_rnti = 0xFFFF
    ncce = pdcch.n_cce(cfg, NID, cfi, ng)
    assert ncce >= 4, ncce
    d = Dci1A(rb_start=0, l_crb=6, mcs=4, rv=0, tpc=0)
    bits = dci_1a_pack(d, cfg.n_rb_dl)
    sym = pdcch.pdcch_encode([(bits, si_rnti, 0, 4)], cfg, NID, cfi, ng, sf)[0]
    # perfect channel -> LLRs; NIL REs give 0 LLR
    llr = np.asarray(demodulate_maxlog(sym, "qpsk"))
    logical = pdcch.pdcch_llrs_to_logical(jnp.asarray(llr), cfg, NID, cfi, ng, sf)
    found = pdcch.pdcch_blind_decode_1a(logical, cfg.n_rb_dl, si_rnti, ncce)
    assert len(found) >= 1
    dci, start, l_agg = found[0]
    assert (start, l_agg) == (0, 4)
    assert (dci.rb_start, dci.l_crb, dci.mcs, dci.rv) == (0, 6, 4, 0)


def test_pdsch_loopback_small_and_segmented():
    rng = np.random.default_rng(1)
    cases = [
        (152, 100, 2),      # 1.4 MHz MCS0-ish, single CB
        (4392, 4000, 4),    # single CB 16QAM
        (12960, 8000, 6),   # multi-codeblock 64QAM
    ]
    for tbs, n_re, qm in cases:
        geom = pdsch.pdsch_geometry(tbs, n_re, qm, rv=0)
        tb = rng.integers(0, 2, size=tbs).astype(np.int32)
        scheme = {2: "qpsk", 4: "16qam", 6: "64qam"}[qm]
        sym = pdsch.pdsch_encode(tb, geom, 0xFFFF, 5, NID, scheme)
        assert sym.shape == (n_re,)
        llr = pdsch.pdsch_symbols_to_llrs(sym, 0.1, scheme)
        got, ok, cb_oks = pdsch.pdsch_decode_llrs(llr, geom, 0xFFFF, 5, NID,
                                                  n_iter=4)
        assert ok, (tbs, n_re, qm)
        np.testing.assert_array_equal(got, tb)
        assert cb_oks.all()


def test_tbs_tables_sane():
    # anchors
    assert get_tbs_for_mcs(0, 6) == (152, "qpsk")
    assert get_tbs_for_mcs(28, 100) == (75376, "64qam")
    # uniform segmentation for all entries (static-shape invariant)
    from lteax.phy.tables.tbs import TBS_COLUMNS
    from lteax.phy.fec.segmentation import segment_info
    for col, vals in TBS_COLUMNS.items():
        assert len(vals) == 27
        assert all(b > a for a, b in zip(vals, vals[1:])), col
        for t in vals:
            info = segment_info(t + 24)
            assert info.uniform, (col, t, info)


def test_dci_1c_roundtrip():
    from lteax.phy.channels.dci import Dci1C, dci_1c_pack, dci_1c_unpack, dci_1c_size, TBS_1C
    assert len(TBS_1C) == 32
    assert all(b > a for a, b in zip(TBS_1C, TBS_1C[1:]))
    for n_rb in (25, 50, 100):
        d = Dci1C(rb_start=1, l_crb=3, i_tbs=14)
        bits = dci_1c_pack(d, n_rb)
        assert len(bits) == dci_1c_size(n_rb)
        back = dci_1c_unpack(bits, n_rb)
        assert (back.rb_start, back.l_crb, back.i_tbs) == (1, 3, 14)
        assert back.tbs() == TBS_1C[14]


def test_dci_0_roundtrip():
    from lteax.phy.channels.dci import Dci0, dci_0_pack, dci_0_unpack, dci_1a_size
    for n_rb in (6, 50):
        size = dci_1a_size(n_rb)
        d = Dci0(rb_start=2, l_crb=3, mcs=11, ndi=1, tpc=2, dmrs_cs=5,
                 cqi_request=True)
        bits = dci_0_pack(d, n_rb, size)
        assert len(bits) == size
        back = dci_0_unpack(bits, n_rb)
        assert (back.rb_start, back.l_crb, back.mcs, back.dmrs_cs,
                back.cqi_request) == (2, 3, 11, 5, True)


def test_pbch_4port_fstd_roundtrip():
    """4-antenna SFBC+FSTD PBCH: precode -> unit channels -> combine -> decode."""
    from lteax.phy.chest import combine_sfbc_fstd
    rng = np.random.default_rng(9)
    mib = rng.integers(0, 2, size=24).astype(np.int32)
    quarters = np.asarray(pbch.pbch_encode_40ms(jnp.asarray(mib), 4, NID))
    ports = pbch.pbch_quarter_to_grid(jnp.asarray(quarters[1]), CFG, NID, 4)
    # distinct flat channels per port
    hs = [np.complex64(a) for a in (0.9, 0.7 * np.exp(1j * 0.5),
                                    1.1 * np.exp(-1j * 0.3),
                                    0.8 * np.exp(1j * 1.2))]
    y = sum(np.asarray(ports[p]) * hs[p] for p in range(4))
    nv = 1e-3
    y = y + (rng.standard_normal(y.shape) + 1j * rng.standard_normal(y.shape)
             ).astype(np.complex64) * np.sqrt(nv / 2)
    n = len(y)
    x_eq, eff = combine_sfbc_fstd(
        jnp.asarray(y), *[jnp.full(n, h) for h in hs], nv)
    llr = demodulate_maxlog(x_eq, "qpsk", eff)
    got, ant, q, ok = pbch.pbch_blind_decode({4: np.asarray(llr)}, NID)
    assert ok and ant == 4 and q == 1
    np.testing.assert_array_equal(got, mib)


def test_tbs_cross_column_monotone():
    """TBS non-decreasing along N_PRB for each I_TBS (validates new columns)."""
    from lteax.phy.tables.tbs import TBS_COLUMNS
    cols = sorted(TBS_COLUMNS)
    for itbs in range(27):
        vals = [TBS_COLUMNS[c][itbs] for c in cols]
        assert all(b >= a for a, b in zip(vals, vals[1:])), (itbs, vals)


def test_tbs_entries_segment_uniformly():
    """Transcription checksum: every table entry must be a uniformly
    segmenting TBS (C equal code blocks, zero filler) — a property of the
    whole 36.213 table that arbitrary transcription errors break."""
    from lteax.phy.tables.tbs import TBS_COLUMNS, _allowed_uniform_tbs
    allowed = set(_allowed_uniform_tbs())
    for n, col in TBS_COLUMNS.items():
        assert len(col) == 27, n
        for t in col:
            assert t in allowed, (n, t)


def test_tbs_full_table():
    """The complete 27x110 table: monotone along both axes, every entry in
    the uniform-segmentation set, consistent with the anchor-column view,
    per-row spectral efficiency flat (within quantization) for N_PRB>=10,
    provenance strings well-formed."""
    from lteax.phy.tables.tbs import (get_tbs, get_tbs_provenance,
                                      TBS_COLUMNS, TBS_TABLE, PROV,
                                      _allowed_uniform_tbs)
    allowed = set(_allowed_uniform_tbs())
    assert len(TBS_TABLE) == 27 and all(len(r) == 110 for r in TBS_TABLE)
    grid = [[get_tbs(i, n) for n in range(1, 111)] for i in range(27)]
    for i in range(27):
        row = grid[i]
        assert all(b >= a for a, b in zip(row, row[1:])), i
        assert all(t in allowed for t in row), i
        if i:
            assert all(b >= a for a, b in zip(grid[i - 1], row)), i
        # SE flatness: quantization + known table plateaus stay within ~8%
        ses = [(row[n - 1] + 24) / (120.0 * n) for n in range(10, 111)]
        med = sorted(ses)[len(ses) // 2]
        assert all(abs(s / med - 1.0) < 0.08 for s in ses), i
    for n, col in TBS_COLUMNS.items():
        assert [grid[i][n - 1] for i in range(27)] == list(col), n
    assert len(PROV) == 27 and all(len(p) == 110 for p in PROV)
    assert set("".join(PROV)) <= {"A", "R", "F"}
    assert get_tbs_provenance(26, 100) == "A"
    # famous cells
    assert get_tbs(26, 110) == 75376          # max single-codeword TBS
    assert grid[26][99] == 75376


def test_dci_1_rbg_allocation_and_roundtrip():
    from lteax.phy.channels.dci import (Dci1, dci_1_pack, dci_1_unpack,
                                        dci_1_size, dci_1a_size, rbg_size,
                                        n_rbg, rbg_bitmap_to_prbs,
                                        prbs_to_rbg_bitmap)
    # 36.213 Table 7.1.6.1-1 RBG sizes
    assert [rbg_size(n) for n in (6, 15, 25, 50, 75, 100)] == [1, 2, 2, 3, 4, 4]
    assert n_rbg(100) == 25 and n_rbg(50) == 17 and n_rbg(25) == 13
    # short last RBG: 50 PRB, P=3 -> last RBG holds PRBs 48..49 only
    full = (1 << n_rbg(50)) - 1
    assert rbg_bitmap_to_prbs(full, 50) == list(range(50))
    assert rbg_bitmap_to_prbs(1, 50) == [48, 49]
    assert prbs_to_rbg_bitmap([0, 49], 50) == (1 << (n_rbg(50) - 1)) | 1
    # sizes never collide with 1A (padding rule)
    for n_rb in (6, 15, 25, 50, 75, 100):
        assert dci_1_size(n_rb) != dci_1a_size(n_rb)
    # pack/unpack roundtrip
    for n_rb in (6, 25, 100):
        bm = prbs_to_rbg_bitmap([0, n_rb - 1], n_rb)
        d = Dci1(rbg_bitmap=bm, mcs=17, rv=2, harq=5, ndi=1, tpc=3)
        bits = dci_1_pack(d, n_rb)
        assert len(bits) == dci_1_size(n_rb)
        back = dci_1_unpack(bits, n_rb)
        assert back is not None
        assert (back.rbg_bitmap, back.mcs, back.rv, back.harq, back.ndi,
                back.tpc) == (bm, 17, 2, 5, 1, 3)
    # all-zero bitmap rejected
    z = dci_1_pack(Dci1(rbg_bitmap=prbs_to_rbg_bitmap([3], 25), mcs=0, rv=0), 25)
    z[1 if 25 > 10 else 0:1 + n_rbg(25)] = 0
    assert dci_1_unpack(z, 25) is None


def test_pdcch_blind_decode_format1():
    from lteax.phy.channels.dci import Dci1, dci_1_pack, prbs_to_rbg_bitmap
    cfg = CFG
    cfi, sf, ng = 3, 2, 1.0
    rnti = 0x003D
    ncce = pdcch.n_cce(cfg, NID, cfi, ng)
    bm = prbs_to_rbg_bitmap([1, 4], cfg.n_rb_dl)
    d = Dci1(rbg_bitmap=bm, mcs=9, rv=0, harq=2)
    bits = dci_1_pack(d, cfg.n_rb_dl)
    sym = pdcch.pdcch_encode([(bits, rnti, 0, 4)], cfg, NID, cfi, ng, sf)[0]
    llr = np.asarray(demodulate_maxlog(sym, "qpsk"))
    logical = pdcch.pdcch_llrs_to_logical(jnp.asarray(llr), cfg, NID, cfi,
                                          ng, sf)
    found = pdcch.pdcch_blind_decode_1(logical, cfg.n_rb_dl, rnti, ncce)
    assert len(found) >= 1
    dci, start, l_agg = found[0]
    assert dci.rbg_bitmap == bm and dci.mcs == 9 and dci.harq == 2
    assert dci.prbs(cfg.n_rb_dl) == [1, 4]


def test_dci_1b_1d_roundtrip():
    from lteax.phy.channels.dci import (Dci1B, Dci1D, dci_1b_pack,
                                        dci_1b_unpack, dci_1d_pack,
                                        dci_1d_unpack, dci_1b_size,
                                        dci_1a_size, AMBIGUOUS_SIZES)
    for n_rb in (6, 25, 50, 100):
        for n_ant in (2, 4):
            sz = dci_1b_size(n_rb, n_ant)
            assert sz not in AMBIGUOUS_SIZES and sz != dci_1a_size(n_rb)
            d = Dci1B(rb_start=2, l_crb=3, mcs=17, rv=2, harq=5, ndi=1,
                      tpc=3, tpmi=n_ant - 1, pmi_confirm=1, distributed=False)
            back = dci_1b_unpack(dci_1b_pack(d, n_rb, n_ant), n_rb, n_ant)
            assert back == d
            e = Dci1D(rb_start=1, l_crb=4, mcs=8, rv=0, tpmi=1,
                      dl_power_offset=1)
            back = dci_1d_unpack(dci_1d_pack(e, n_rb, n_ant), n_rb, n_ant)
            assert back == e


def test_dci_3_3a_roundtrip():
    from lteax.phy.channels.dci import (dci_3_pack, dci_3_unpack,
                                        dci_3a_pack, dci_3a_unpack,
                                        dci_3_n_commands, dci_3a_n_commands,
                                        dci_1a_size)
    for n_rb in (6, 50, 100):
        n = dci_3_n_commands(n_rb)
        cmds = tuple((i * 7) % 4 for i in range(n))
        bits = dci_3_pack(cmds, n_rb)
        assert len(bits) == dci_1a_size(n_rb)
        assert dci_3_unpack(bits, n_rb) == cmds
        m = dci_3a_n_commands(n_rb)
        cmds1 = tuple(i % 2 for i in range(m))
        bits = dci_3a_pack(cmds1, n_rb)
        assert dci_3a_unpack(bits, n_rb) == cmds1


def test_pdcch_blind_decode_1b_and_3():
    """Formats 1B (UE-specific TM6 grant) and 3 (TPC-RNTI group power
    control) through the PDCCH encode -> blind decode loop."""
    from lteax.phy.channels.dci import (Dci1B, dci_1b_pack, dci_3_pack,
                                        dci_3_n_commands)
    cfg = PhyConfig(n_rb_dl=25)
    cfi, sf, ng = 3, 2, 1.0
    rnti_ue, rnti_tpc = 0x3D, 0x10
    ncce = pdcch.n_cce(cfg, NID, cfi, ng)
    assert ncce >= 8, ncce
    d = Dci1B(rb_start=3, l_crb=2, mcs=12, rv=0, tpmi=2, pmi_confirm=1)
    bits_b = dci_1b_pack(d, cfg.n_rb_dl)
    cmds = tuple(i % 4 for i in range(dci_3_n_commands(cfg.n_rb_dl)))
    bits_3 = dci_3_pack(cmds, cfg.n_rb_dl)
    sym = pdcch.pdcch_encode([(bits_b, rnti_ue, 0, 4),
                              (bits_3, rnti_tpc, 4, 4)],
                             cfg, NID, cfi, ng, sf)[0]
    llr = np.asarray(demodulate_maxlog(sym, "qpsk"))
    logical = pdcch.pdcch_llrs_to_logical(jnp.asarray(llr), cfg, NID, cfi,
                                          ng, sf)
    found = pdcch.pdcch_blind_decode_1b(logical, cfg.n_rb_dl, rnti_ue, ncce)
    assert found and found[0][0] == d
    found3 = pdcch.pdcch_blind_decode_3(logical, cfg.n_rb_dl, rnti_tpc, ncce)
    assert found3 and found3[0][0] == cmds
