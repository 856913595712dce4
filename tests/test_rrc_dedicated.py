"""Dedicated-mode RRC codec round-trips (UL/DL CCCH + DCCH)."""

import numpy as np
import pytest

from lteax.stack import rrc_dedicated as rd


def test_connection_request_roundtrip():
    for ident in (("random", 0x5A5A5A5A5A), ("stmsi", 0x42, 0xDEADBEEF)):
        m = rd.RrcConnectionRequest(cause="mo-Data", identity=ident)
        out = rd.unpack_ul_ccch(rd.pack_ul_ccch(m))
        assert out == m


def test_connection_setup_roundtrip():
    m = rd.RrcConnectionSetup(
        rrc_ti=2,
        rrcd=rd.RadioResourceConfigDedicated(
            srb_to_add=(rd.SrbToAddMod(1),)))
    out = rd.unpack_dl_ccch(rd.pack_dl_ccch(m))
    assert out == m


def test_setup_complete_carries_nas():
    nas = bytes(range(64))
    m = rd.RrcConnectionSetupComplete(rrc_ti=2, selected_plmn=1, nas=nas)
    out = rd.unpack_ul_dcch(rd.pack_ul_dcch(m))
    assert isinstance(out, rd.RrcConnectionSetupComplete)
    assert out.nas == nas and out.rrc_ti == 2


def test_information_transfer_roundtrip():
    up = rd.UlInformationTransfer(nas=b"\x07\x41\x01" + bytes(200))
    assert rd.unpack_ul_dcch(rd.pack_ul_dcch(up)) == up
    dn = rd.DlInformationTransfer(rrc_ti=1, nas=b"\x07\x42" + bytes(30))
    assert rd.unpack_dl_dcch(rd.pack_dl_dcch(dn)) == dn


def test_security_mode_roundtrip():
    m = rd.SecurityModeCommand(rrc_ti=1, ciphering="eea2", integrity="eia2")
    assert rd.unpack_dl_dcch(rd.pack_dl_dcch(m)) == m
    c = rd.SecurityModeComplete(rrc_ti=1)
    assert rd.unpack_ul_dcch(rd.pack_ul_dcch(c)) == c


def test_reconfiguration_with_drb_and_nas():
    drb = rd.DrbToAddMod(eps_bearer_identity=5, drb_identity=1, lcid=3)
    m = rd.RrcConnectionReconfiguration(
        rrc_ti=3,
        nas_list=(b"\x27" + bytes(40),),
        rrcd=rd.RadioResourceConfigDedicated(drb_to_add=(drb,)))
    out = rd.unpack_dl_dcch(rd.pack_dl_dcch(m))
    assert out == m
    c = rd.RrcConnectionReconfigurationComplete(rrc_ti=3)
    assert rd.unpack_ul_dcch(rd.pack_ul_dcch(c)) == c


def test_release_roundtrip():
    m = rd.RrcConnectionRelease(rrc_ti=0, cause="other")
    assert rd.unpack_dl_dcch(rd.pack_dl_dcch(m)) == m


def test_ue_capability_transfer_roundtrip():
    enq = rd.UeCapabilityEnquiry(rrc_ti=1, rat_types=("eutra", "utra"))
    assert rd.unpack_dl_dcch(rd.pack_dl_dcch(enq)) == enq

    cap = rd.UeEutraCapability(
        ue_category=4, rohc_profiles=0b000000101,
        tx_antenna_selection=True,
        bands=(rd.BandCapability(1), rd.BandCapability(7, half_duplex=True,
                                                       need_for_gaps=False)),
        feature_groups=0xDEADBEEF)
    blob = rd.bits_to_bytes(rd.pack_ue_eutra_capability(cap))
    got = rd.unpack_ue_eutra_capability(rd.bytes_to_bits(blob))
    assert got == cap

    info = rd.UeCapabilityInformation(rrc_ti=1,
                                      containers=(("eutra", blob),))
    out = rd.unpack_ul_dcch(rd.pack_ul_dcch(info))
    assert out == info
    assert rd.unpack_ue_eutra_capability(
        rd.bytes_to_bits(out.containers[0][1])) == cap


def test_byte_framing_roundtrip():
    """Messages survive PDCP byte framing (pad to octet, strip on unpack)."""
    m = rd.RrcConnectionSetup(rrc_ti=1)
    raw = rd.bits_to_bytes(rd.pack_dl_ccch(m))
    assert rd.unpack_dl_ccch(rd.bytes_to_bits(raw)) == m


def test_unsupported_alternative_rejected():
    # craft a c1 CHOICE with an alternative neither channel implements
    bits = np.zeros(16, dtype=np.int32)
    bits[1:5] = (1, 1, 1, 1)       # c1 alternative 15
    with pytest.raises(ValueError):
        rd.unpack_ul_dcch(bits)
    with pytest.raises(ValueError):
        rd.unpack_dl_dcch(bits)
    ext = np.ones(16, dtype=np.int32)   # messageClassExtension flag set
    with pytest.raises(ValueError):
        rd.unpack_ul_dcch(ext)


def test_connection_reject_roundtrip():
    m = rd.RrcConnectionReject(wait_time=16)
    out = rd.unpack_dl_ccch(rd.pack_dl_ccch(m))
    assert out == m


def test_reestablishment_flow_roundtrip():
    req = rd.RrcConnectionReestablishmentRequest(
        c_rnti=0xBEEF, phys_cell_id=503, short_mac_i=0x1234,
        cause="handoverFailure")
    assert rd.unpack_ul_ccch(rd.pack_ul_ccch(req)) == req
    # requests and connection requests share the UL-CCCH channel
    plain = rd.RrcConnectionRequest()
    assert isinstance(rd.unpack_ul_ccch(rd.pack_ul_ccch(plain)),
                      rd.RrcConnectionRequest)
    re = rd.RrcConnectionReestablishment(rrc_ti=3, ncc=5)
    out = rd.unpack_dl_ccch(rd.pack_dl_ccch(re))
    assert out == re and out.ncc == 5
    rej = rd.RrcConnectionReestablishmentReject()
    assert rd.unpack_dl_ccch(rd.pack_dl_ccch(rej)) == rej
    done = rd.RrcConnectionReestablishmentComplete(rrc_ti=3)
    assert rd.unpack_ul_dcch(rd.pack_ul_dcch(done)) == done


def test_security_mode_failure_roundtrip():
    m = rd.SecurityModeFailure(rrc_ti=2)
    assert rd.unpack_ul_dcch(rd.pack_ul_dcch(m)) == m


def test_measurement_report_roundtrip():
    serv_only = rd.MeasurementReport(meas_id=7, serv_rsrp=60, serv_rsrq=20)
    assert rd.unpack_ul_dcch(rd.pack_ul_dcch(serv_only)) == serv_only
    with_neigh = rd.MeasurementReport(
        meas_id=32, serv_rsrp=97, serv_rsrq=34,
        neigh=(rd.MeasResultEutra(phys_cell_id=214, rsrp=45, rsrq=10),
               rd.MeasResultEutra(phys_cell_id=0, rsrp=12, rsrq=None),
               rd.MeasResultEutra(phys_cell_id=101, rsrp=None, rsrq=None)))
    out = rd.unpack_ul_dcch(rd.pack_ul_dcch(with_neigh))
    assert out == with_neigh
    # byte framing survives too
    raw = rd.bits_to_bytes(rd.pack_ul_dcch(with_neigh))
    assert rd.unpack_ul_dcch(rd.bytes_to_bits(raw)) == with_neigh
