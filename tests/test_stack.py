"""Stack codecs: security primitives (published 3GPP test vectors), bands,
RRC MIB/SIB roundtrips."""

import numpy as np

from lteax.stack import security, bands, rrc


# --- Milenage: 35.207 Test Set 1 ---
K = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
RAND = bytes.fromhex("23553cbe9637a89d218ae64dae47bf35")
OP = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")
OPC = bytes.fromhex("cd63cb71954a9f4e48a5994e37a02baf")
SQN = bytes.fromhex("ff9bb4d0b607")
AMF = bytes.fromhex("b9b9")


def test_milenage_opc():
    assert security.milenage_op_c(K, OP) == OPC


def test_milenage_f1():
    mac_a, _mac_s = security.milenage_f1(K, RAND, SQN, AMF, op_c=OPC)
    assert mac_a == bytes.fromhex("4a9ffac354dfafb3")


def test_milenage_f2345():
    res, ck, ik, ak = security.milenage_f2345(K, RAND, op_c=OPC)
    assert res == bytes.fromhex("a54211d5e3ba50bf")
    assert ck == bytes.fromhex("b40ba9a3c58b2a05bbf0d987b21bf8cb")
    assert ik == bytes.fromhex("f769bcd751044604127672711c6d3441")
    assert ak == bytes.fromhex("aa689c648370")


def test_eia2_vector():
    """33.401 Annex C.2 128-EIA2 test set 1 (58-bit message)."""
    key = bytes.fromhex("2bd6459f82c5b300952c49104881ff48")
    mac = security.eia2(key, 0x38A6F056, 0x18, 0,
                        bytes.fromhex("3332346263393840"), data_bits=58)
    assert mac == bytes.fromhex("118c6eb8")


def test_aes_cmac_rfc4493():
    """RFC 4493 test vectors (byte-aligned path)."""
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    assert security.aes_cmac(key, b"") == \
        bytes.fromhex("bb1d6929e95937287fa37d129b756746")
    m = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert security.aes_cmac(key, m) == \
        bytes.fromhex("070a16b46b4d4144f79bdd9dd04a287c")


def test_eea2_roundtrip_and_count_sensitivity():
    key = bytes(range(16))
    data = bytes(range(64))
    c = security.eea2(key, 7, 3, 1, data)
    assert c != data
    assert security.eea2(key, 7, 3, 1, c) == data
    assert security.eea2(key, 8, 3, 1, c) != data


def test_kdf_keys_distinct():
    k_asme = security.generate_k_asme(bytes(16), bytes(16), bytes(6),
                                      bytes.fromhex("00f110"))
    k_enb = security.generate_k_enb(k_asme, 0)
    k_nas_enc, k_nas_int = security.generate_nas_keys(k_asme)
    k_rrc_enc, k_rrc_int, k_up = security.generate_as_keys(k_enb)
    keys = {k_asme, k_enb, k_nas_enc, k_nas_int, k_rrc_enc, k_rrc_int, k_up}
    assert len(keys) == 7
    assert all(len(k) in (16, 32) for k in keys)


def test_bands():
    assert bands.dl_earfcn_to_freq_mhz(300) == 2140.0           # band 1
    assert bands.band_of_dl_earfcn(300) == 1
    # TDD rows (36.101 Table 5.7.3-1): UL EARFCN == DL EARFCN
    assert bands.dl_earfcn_to_freq_mhz(38000) == 2595.0         # band 38
    assert bands.band_of_dl_earfcn(38000) == 38
    assert bands.is_tdd_band(38) and not bands.is_tdd_band(20)
    assert bands.ul_earfcn_for_dl(38000) == 38000
    assert bands.dl_earfcn_to_freq_mhz(36000) == 1900.0         # band 33
    assert bands.dl_earfcn_to_freq_mhz(46589) == 802.9          # band 44 top
    assert bands.dl_freq_to_earfcn(1, 2140.0) == 300
    assert bands.band_of_dl_earfcn(6300) == 20
    assert bands.ul_earfcn_for_dl(300) == 18300
    lst = bands.band_dl_earfcns(1, step=100)
    assert lst[0] == 0 and len(lst) == 6


def test_mib_roundtrip():
    for nrb in (6, 50, 100):
        for res in (1 / 6, 2):
            for sfn in (0, 437, 1023):
                m = rrc.Mib(nrb, False, res, sfn)
                bits = rrc.pack_mib(m)
                assert len(bits) == 24
                back = rrc.unpack_mib(bits, sfn_mod4=sfn & 3)
                assert back == m


def test_sib_roundtrips():
    s1 = rrc.Sib1(mcc=(3, 1, 0), mnc=(2, 6, 0), tac=0xFFFF,
                  cell_identity=(1 << 28) - 1,
                  scheduling=(rrc.SchedulingInfo(64, (3, 4, 5)),
                              rrc.SchedulingInfo(128, (6,))))
    assert rrc.unpack_sib1(rrc.pack_sib1(s1)) == s1
    s2 = rrc.Sib2(number_of_ra_preambles=9, ul_carrier_freq_earfcn=20400,
                  prach_root_sequence_index=710, pucch_n1_an=2047,
                  ul_bandwidth=None, pusch_enable_64qam=True)
    kind, back = rrc.unpack_si(rrc.pack_sib2(s2))
    assert kind == "sib2" and back == s2
    # padded (as carried in a TB) still decodes
    padded = rrc.pad_to(rrc.pack_sib1(s1), 328)
    assert rrc.unpack_sib1(padded) == s1


def test_sib3_and_paging_roundtrip():
    s3 = rrc.Sib3(q_hyst_db=4, cell_resel_priority=7, q_rx_lev_min=-60)
    kind, back = rrc.unpack_si_ext(rrc.pack_sib3(s3))
    assert kind == "sib3" and back == s3
    # sib2 still routes through the extended unpacker
    kind2, _ = rrc.unpack_si_ext(rrc.pack_sib2(rrc.Sib2()))
    assert kind2 == "sib2"
    p = rrc.Paging(ue_identities=(0xDEADBEEF, 0x12345678),
                   system_info_modification=True)
    assert rrc.unpack_paging(rrc.pack_paging(p)) == p
    assert rrc.unpack_paging(rrc.pack_sib3(s3)) is None


def test_sib4_to_sib11_uper_roundtrips():
    """Rel-8 SIB3..SIB11 UPER codecs: pack->unpack identity, including
    multi-SIB SystemInformation messages and optional-field permutations."""
    s3 = rrc.Sib3(q_hyst_db=8, s_non_intra_search=None, p_max=23,
                  s_intra_search=12, allowed_meas_bandwidth=5,
                  presence_antenna_port1=True, neigh_cell_config=2,
                  speed_state=rrc.SpeedStateReselectionPars(
                      rrc.MobilityStateParameters(1, 2, 3, 16), 0, 2),
                  t_resel_eutra_sf=rrc.SpeedStateScaleFactors(1, 2))
    s4 = rrc.Sib4(
        neigh_cells=(rrc.IntraFreqNeighCell(503, -24),
                     rrc.IntraFreqNeighCell(7, 24)),
        black_cells=(rrc.PhysCellIdRange(100, 12),
                     rrc.PhysCellIdRange(400, None)),
        csg_pci_range=rrc.PhysCellIdRange(0, 504))
    s5 = rrc.Sib5(carriers=(
        rrc.InterFreqCarrier(dl_earfcn=6400, p_max=10, cell_resel_priority=3,
                             q_offset_freq_db=-6,
                             neigh_cells=(rrc.InterFreqNeighCell(44, 2),),
                             black_cells=(rrc.PhysCellIdRange(5, 8),)),
        rrc.InterFreqCarrier(dl_earfcn=65535),
    ))
    s6 = rrc.Sib6(
        carriers_fdd=(rrc.UtraCarrierFdd(10713, cell_resel_priority=2,
                                         q_qual_min=-24),),
        carriers_tdd=(rrc.UtraCarrierTdd(11504),),
        t_resel_utra_s=3, t_resel_utra_sf=rrc.SpeedStateScaleFactors(0, 1))
    s7 = rrc.Sib7(
        t_resel_geran_s=2,
        carriers=(
            rrc.GeranCarrierInfo(
                freqs=rrc.GeranCarrierFreqs(512, 1,
                                            explicit_arfcns=(1, 2, 1023)),
                cell_resel_priority=1, q_rx_lev_min=45, p_max_geran=39),
            rrc.GeranCarrierInfo(
                freqs=rrc.GeranCarrierFreqs(0, 0, equally_spaced=(8, 31))),
            rrc.GeranCarrierInfo(
                freqs=rrc.GeranCarrierFreqs(99, 0, bitmap=b"\xa5\x5a")),
        ))
    s8 = rrc.Sib8(
        cdma_eutra_sync=True, system_time=(1 << 39) - 5,
        search_window_size=9,
        pre_reg_hrpd=rrc.PreRegistrationInfoHrpd(True, 200, (1, 2)),
        cell_resel_hrpd=rrc.CellReselParamsCdma(
            band_class_list=(rrc.BandClassInfoCdma(17, 4, 63, 0),),
            neigh_cell_list=(rrc.NeighCellCdma(
                1, (rrc.NeighCellsPerBandclassCdma(2047, (0, 511)),)),),
            t_resel_s=5),
        params_1xrtt=True,
        csfb_1xrtt=rrc.CsfbRegistrationParam1xrtt(
            sid=0x7FFF, nid=0xFFFF, home_reg=True, power_up_reg=True,
            registration_zone=0xABC, zone_timer=5),
        long_code_state_1xrtt=(1 << 42) - 3)
    s9 = rrc.Sib9(hnb_name="cell-one".encode())
    s10 = rrc.Sib10(message_identifier=0x1100, serial_number=0x3000,
                    warning_type=b"\x01\x80",
                    warning_security_info=bytes(range(50)))
    s11 = rrc.Sib11(message_identifier=0x1102, serial_number=0x3001,
                    last_segment=False, segment_number=2,
                    warning_segment=b"quake warning segment",
                    data_coding_scheme=b"\x01")
    for sib in (s3, s4, s5, s6, s7, s8, s9, s10, s11):
        got = rrc.unpack_si_list(rrc.pack_si(sib))
        assert len(got) == 1 and got[0][1] == sib, type(sib).__name__
    # multi-SIB SI message (one SystemInformation carrying three SIBs)
    multi = rrc.pack_si(rrc.Sib2(), s3, s4)
    got = rrc.unpack_si_list(multi)
    assert [k for k, _ in got] == ["sib2", "sib3", "sib4"]
    assert got[1][1] == s3 and got[2][1] == s4
    # padded to a TB still decodes
    got2 = rrc.unpack_si_list(rrc.pad_to(multi, len(multi) + 61))
    assert got2 == got


def test_paging_uper_records():
    # 40-bit S-TMSI (mmec != 0), etws indication, empty rejected
    p = rrc.Paging(ue_identities=((0xA5 << 32) | 0xDEADBEEF,),
                   etws_indication=True)
    assert rrc.unpack_paging(rrc.pack_paging(p)) == p
    assert rrc.unpack_paging(rrc.pack_paging(rrc.Paging())) is None


def test_sib12_sib13_uper_roundtrips():
    """Rel-9 extension SIBs (CMAS SIB12, MBSFN SIB13) ride the
    sib-TypeAndInfo CHOICE extension as open-type fields; unknown extension
    indices are skipped (open-type length), later entries still decode."""
    s12 = rrc.Sib12(message_identifier=0x1112, serial_number=0x3000,
                    last_segment=False, segment_number=3,
                    warning_segment=b"CMAS presidential alert",
                    data_coding_scheme=b"\x01")
    s13 = rrc.Sib13(
        areas=(rrc.MbsfnAreaInfo(mbsfn_area_id=5, non_mbsfn_region_length=2,
                                 notification_indicator=3,
                                 mcch_repetition_period_rf=128, mcch_offset=7,
                                 mcch_modification_period_rf=1024,
                                 sf_alloc_info=0b101010, signalling_mcs=13),
               rrc.MbsfnAreaInfo(mbsfn_area_id=200)),
        notification=rrc.MbmsNotificationConfig(4, 10, 6))
    got = rrc.unpack_si_list(rrc.pack_si(rrc.Sib2(), s12, s13))
    assert [k for k, _ in got] == ["sib2", "sib12", "sib13"]
    assert got[1][1] == s12 and got[2][1] == s13
    # extension entry before a root entry: root still decodes after the
    # octet-aligned open type
    got2 = rrc.unpack_si_list(rrc.pack_si(s13, rrc.Sib3()))
    assert [k for k, _ in got2] == ["sib13", "sib3"]
    # unknown extension index is skipped
    from lteax.stack.uper import UperWriter
    from lteax.stack.rrc_sibs import pack_sib3_body
    w = UperWriter()
    w.bit(0); w.bit(0); w.bit(0); w.opt(False)
    w.length(2, 1, 32)
    w.bit(1); w.small_index(7); w.open_type([1, 0, 1, 1, 0])
    w.bit(0); w.cint(1, 0, 9)
    pack_sib3_body(w, rrc.Sib3())
    assert rrc.unpack_si_list(w.array()) == [("sib3", rrc.Sib3())]


def test_bands_full_fdd_table():
    # contiguity/consistency across the whole table
    for b in bands.BANDS:
        n_ch = b.n_dl_max - b.n_offs_dl
        assert b.n_ul_max - b.n_offs_ul == n_ch, b.band
        # UL/DL duplex spacing is constant across the band
        lo = bands.dl_earfcn_to_freq_mhz(b.n_offs_dl)
        assert abs(lo - b.f_dl_low) < 1e-9
    # spot checks against 36.101 Table 5.7.3-1
    assert bands.dl_earfcn_to_freq_mhz(6300) == 806.0            # band 20
    assert bands.ul_earfcn_for_dl(6300) == 24300
    assert bands.band_of_dl_earfcn(9820) == 30
    assert bands.dl_earfcn_to_freq_mhz(4000) == 1864.9           # band 9
    assert bands.dl_earfcn_to_freq_mhz(9900) == 465.5            # band 31
    # band 24 is the one FDD band with UL above DL (L-band)
    b24 = [b for b in bands.BANDS if b.band == 24][0]
    assert b24.f_ul_low > b24.f_dl_low
