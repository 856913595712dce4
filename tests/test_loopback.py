"""Config #1 regression anchor: file_gen → file_scan loopback at 1.4 MHz
(the reference's LTE_fdd_dl_file_gen → LTE_fdd_dl_file_scan path)."""

import numpy as np
import pytest

from lteax.apps.file_gen import GenConfig, generate
from lteax.apps.file_scan import scan
from lteax.io.iq import write_iq, read_iq


def test_loopback_clean():
    gc = GenConfig(n_rb_dl=6, n_cell_id=214, n_frames=4, tac=0x1234)
    x = generate(gc)
    assert len(x) == 4 * 10 * gc.phy.n_samps_subframe
    r = scan(x, gc.phy)
    assert r.n_cell_id == 214
    assert r.mib is not None and r.mib.n_rb_dl == 6
    # scan may lock onto any frame's PSS; SFN must match the frame offset
    assert r.sfn == r.frame_start // gc.phy.n_samps_frame
    assert r.sib1 is not None and r.sib1.tac == 0x1234
    assert r.sib1.mcc == (0, 0, 1) and r.sib1.mnc == (0, 1)
    assert r.sib2 is not None
    assert r.sib_crc_fails == 0


@pytest.mark.heavy
def test_loopback_offset_cfo_noise():
    rng = np.random.default_rng(3)
    gc = GenConfig(n_rb_dl=6, n_cell_id=101, n_frames=6)
    x = generate(gc)
    cfg = gc.phy
    snr_db = 12.0
    nv = np.mean(np.abs(x) ** 2) / 10 ** (snr_db / 10)
    off = 4321
    buf = np.concatenate([
        np.sqrt(nv / 2) * (rng.standard_normal(off)
                           + 1j * rng.standard_normal(off)),
        x]).astype(np.complex64)
    n = np.arange(len(buf))
    buf = (buf * np.exp(2j * np.pi * 200.0 * n / cfg.fs)).astype(np.complex64)
    buf += (np.sqrt(nv / 2) * (rng.standard_normal(len(buf))
                               + 1j * rng.standard_normal(len(buf)))
            ).astype(np.complex64)
    r = scan(buf, cfg)
    assert r.n_cell_id == 101
    assert r.sib1 is not None and r.sib2 is not None
    assert abs(r.cfo_hz - 200.0) < 60.0


@pytest.mark.heavy
def test_loopback_iq_file_roundtrip(tmp_path):
    gc = GenConfig(n_rb_dl=6, n_cell_id=7, n_frames=2)
    x = generate(gc)
    for fmt in ("fc32", "sc8"):
        p = str(tmp_path / f"cap.{fmt}")
        write_iq(p, x, fmt)
        back = read_iq(p, fmt)
        r = scan(back, gc.phy)
        assert r.n_cell_id == 7, fmt
        assert r.mib is not None, fmt


@pytest.mark.heavy
def test_loopback_2port_sfbc():
    """Config #3 capability: 2-port TX diversity gen -> SFBC scan."""
    gc = GenConfig(n_rb_dl=6, n_cell_id=33, n_ant=2, n_frames=4, tac=0x77)
    x = generate(gc)
    r = scan(x, gc.phy)
    assert r.n_cell_id == 33
    assert r.n_ant == 2
    assert r.mib is not None
    assert r.sib1 is not None and r.sib1.tac == 0x77
    assert r.sib2 is not None
    assert r.sib_crc_fails == 0


def test_scan_graceful_on_noise():
    rng = np.random.default_rng(5)
    cfg = GenConfig(n_rb_dl=6).phy
    noise = (rng.standard_normal(60000)
             + 1j * rng.standard_normal(60000)).astype(np.complex64)
    r = scan(noise, cfg)
    assert r.mib is None


@pytest.mark.slow
def test_loopback_5mhz():
    gc = GenConfig(n_rb_dl=25, n_cell_id=88, n_frames=4, tac=0x5A5A)
    r = scan(generate(gc), gc.phy)
    assert r.n_cell_id == 88
    assert r.mib is not None and r.mib.n_rb_dl == 25
    assert r.sib1 is not None and r.sib1.tac == 0x5A5A
    assert r.sib2 is not None
    assert r.snr_db > 30  # noiseless loopback


@pytest.mark.heavy
def test_loopback_extended_cp():
    gc = GenConfig(n_rb_dl=6, n_cell_id=77, n_frames=4, tac=0xECB,
                   extended_cp=True)
    assert gc.phy.n_sym_subframe == 12
    r = scan(generate(gc), gc.phy)
    assert r.n_cell_id == 77
    assert r.mib is not None
    assert r.sib1 is not None and r.sib1.tac == 0xECB
    assert r.sib2 is not None


@pytest.mark.slow
def test_loopback_4port_fstd():
    """4-antenna SFBC+FSTD cell: blind n_ant=4 MIB + SI decode."""
    gc = GenConfig(n_rb_dl=6, n_cell_id=150, n_ant=4, n_frames=4, tac=0x444,
                   cfi=3)  # 4-ant control region needs 4 symbols for L=4 CCEs
    r = scan(generate(gc), gc.phy)
    assert r.n_cell_id == 150
    assert r.n_ant == 4
    assert r.sib1 is not None and r.sib1.tac == 0x444
    assert r.sib2 is not None


@pytest.mark.heavy
def test_loopback_dci_1c():
    """SI carried with compact DCI format 1C (real networks often do)."""
    gc = GenConfig(n_rb_dl=6, n_cell_id=99, n_frames=4, tac=0x1C1C,
                   si_dci="1c")
    r = scan(generate(gc), gc.phy)
    assert r.n_cell_id == 99
    assert r.sib1 is not None and r.sib1.tac == 0x1C1C
    assert r.sib2 is not None


@pytest.mark.slow
def test_loopback_10mhz_epa_fading():
    """Config #3 gate: 10 MHz under EPA multipath + noise decodes SI."""
    from lteax.sim.channel import fade_and_awgn
    rng = np.random.default_rng(9)
    gc = GenConfig(n_rb_dl=50, n_cell_id=310, n_frames=4, tac=0xFAD)
    x = generate(gc)
    y, h = fade_and_awgn(rng, x, "epa", gc.phy.fs, snr_db=18.0)
    r = scan(y, gc.phy)
    assert r.n_cell_id == 310
    assert r.mib is not None and r.mib.n_rb_dl == 50
    assert r.sib1 is not None and r.sib1.tac == 0xFAD
    assert r.evm_pct > 0


@pytest.mark.heavy
def test_loopback_paging():
    """Paging records over PDSCH @ P-RNTI (DCI 1C, subframe 9)."""
    gc = GenConfig(n_rb_dl=6, n_cell_id=200, n_frames=4,
                   paging_tmsi=(0xDEADBEEF, 0x1234ABCD))
    r = scan(generate(gc), gc.phy)
    assert r.n_cell_id == 200
    assert r.paging == [hex(0xDEADBEEF), hex(0x1234ABCD)]
    assert r.sib1 is not None


@pytest.mark.heavy
def test_loopback_extra_sibs():
    """gen carries SIB3/SIB5/SIB9 alongside SIB2 in the SI window; scan
    decodes and reports them (multi-SIB SystemInformation end-to-end)."""
    from lteax.stack import rrc
    s3 = rrc.Sib3(q_hyst_db=6, cell_resel_priority=5, q_rx_lev_min=-64)
    s5 = rrc.Sib5(carriers=(rrc.InterFreqCarrier(
        dl_earfcn=6400, cell_resel_priority=2,
        neigh_cells=(rrc.InterFreqNeighCell(17, 4),)),))
    s9 = rrc.Sib9(hnb_name=b"lteax-home")
    gc = GenConfig(n_rb_dl=6, n_cell_id=150, n_frames=4, tac=0xBEEF,
                   extra_sibs=(s3, s5, s9))
    r = scan(generate(gc), gc.phy)
    assert r.n_cell_id == 150
    assert r.sib1 is not None
    assert r.sib1.scheduling[0].sib_mapping == (3, 5, 9)
    assert r.sib2 is not None
    assert r.sibs["sib3"] == s3
    assert r.sibs["sib5"] == s5
    assert r.sibs["sib9"] == s9
    assert r.sib_crc_fails == 0
    r.to_json()   # bytes fields must serialize


@pytest.mark.heavy
def test_loopback_multi_si_windows():
    """Three SI messages with distinct periodicities: SI1 (SIB2+SIB3) at
    the legacy sf5 slots, SI2 (SIB5) and SI3 (SIB9) in their own 36.331
    SI windows; scan recovers all of them."""
    from lteax.stack import rrc
    s3 = rrc.Sib3(q_hyst_db=6)
    s5 = rrc.Sib5(carriers=(rrc.InterFreqCarrier(dl_earfcn=2850),))
    s9 = rrc.Sib9(hnb_name=b"win-cell")
    gc = GenConfig(n_rb_dl=6, n_cell_id=99, n_frames=8, tac=0xC0DE,
                   extra_sibs=(s3, s5, s9),
                   si_schedule=((8, (3,)), (8, (5,)), (8, (9,))))
    r = scan(generate(gc), gc.phy)
    assert r.n_cell_id == 99
    assert r.sib1 is not None
    assert tuple(e.si_periodicity_rf for e in r.sib1.scheduling) == (8, 8, 8)
    assert r.sib2 is not None
    assert r.sibs["sib3"] == s3
    assert r.sibs["sib5"] == s5, sorted(r.sibs)
    assert r.sibs["sib9"] == s9, sorted(r.sibs)


@pytest.mark.heavy
def test_loopback_rel9_ext_sibs():
    """SIB12 (CMAS) + SIB13 (MBSFN) carried as Rel-9 extension alternatives
    through the full gen->scan PHY loopback."""
    from lteax.stack import rrc
    s12 = rrc.Sib12(message_identifier=0x1112, serial_number=0x3000,
                    warning_segment=b"CMAS TEST", data_coding_scheme=b"\x01")
    s13 = rrc.Sib13(areas=(rrc.MbsfnAreaInfo(mbsfn_area_id=9,
                                             sf_alloc_info=0b110000),))
    gc = GenConfig(n_rb_dl=6, n_cell_id=77, n_frames=8,
                   extra_sibs=(rrc.Sib3(), s12, s13),
                   si_schedule=((8, (3,)), (16, (12, 13))))
    r = scan(generate(gc), gc.phy)
    assert r.n_cell_id == 77
    assert r.sib1.scheduling[1].sib_mapping == (12, 13)
    assert r.sibs["sib12"] == s12
    assert r.sibs["sib13"] == s13
    r.to_json()
