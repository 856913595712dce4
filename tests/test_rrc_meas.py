"""Round-trip tests for measurement-config and handover (mobility) IEs.

(reference capability: liblte_rrc.cc measurement/handover IE pack/unpack
used by liblte_rrc_pack_rrc_connection_reconfiguration_msg.)
"""

import numpy as np

from lteax.stack.uper import UperReader, UperWriter
from lteax.stack import rrc_meas as rm
from lteax.stack import rrc_dedicated as rd
from lteax.stack.rrc_sibs import PhysCellIdRange


def _roundtrip(pack, unpack, obj):
    w = UperWriter()
    pack(w, obj)
    r = UperReader(w.array())
    got = unpack(r)
    assert got == obj, f"\n got: {got}\nwant: {obj}"
    return w.array()


def test_meas_object_eutra_minimal():
    _roundtrip(rm.pack_meas_object_eutra, rm.unpack_meas_object_eutra,
               rm.MeasObjectEutra(carrier_freq=2850))


def test_meas_object_eutra_full():
    o = rm.MeasObjectEutra(
        carrier_freq=6300, allowed_meas_bw=3, presence_antenna_port1=True,
        neigh_cell_config=2, offset_freq=15,
        cells_to_remove=(1, 5, 32),
        cells_to_add=(rm.CellsToAddMod(2, 101, 17),
                      rm.CellsToAddMod(3, 440, 15)),
        black_to_remove=(4,),
        black_to_add=(rm.BlackCellsToAddMod(7, PhysCellIdRange(100, 64)),),
        report_cgi_cell=77)
    _roundtrip(rm.pack_meas_object_eutra, rm.unpack_meas_object_eutra, o)


def test_report_config_events():
    for ev, kw in [("a1", dict(a1_threshold=rm.ThresholdEutra(60))),
                   ("a2", dict(a1_threshold=rm.ThresholdEutra(20, rsrq=True))),
                   ("a3", dict(a3_offset=-6, report_on_leave=True)),
                   ("a4", dict(a1_threshold=rm.ThresholdEutra(45))),
                   ("a5", dict(a1_threshold=rm.ThresholdEutra(40),
                               a5_threshold2=rm.ThresholdEutra(50)))]:
        c = rm.ReportConfigEutra(event=ev, hysteresis=4, time_to_trigger=9,
                                 trigger_quantity_rsrq=(ev == "a2"),
                                 report_quantity_both=True,
                                 max_report_cells=8, report_interval=3,
                                 report_amount=2, **kw)
        _roundtrip(rm.pack_report_config_eutra,
                   rm.unpack_report_config_eutra, c)


def test_report_config_periodical():
    c = rm.ReportConfigEutra(event=None, periodical_report_cgi=True,
                             max_report_cells=1, report_interval=7,
                             report_amount=0)
    _roundtrip(rm.pack_report_config_eutra, rm.unpack_report_config_eutra, c)


def test_meas_config_full_roundtrip():
    m = rm.MeasConfig(
        obj_to_remove=(9,),
        objects=((1, rm.MeasObjectEutra(carrier_freq=300)),
                 (2, rm.MeasObjectEutra(carrier_freq=6400,
                                        cells_to_add=(rm.CellsToAddMod(
                                            1, 17),)))),
        report_to_remove=(3, 4),
        reports=((1, rm.ReportConfigEutra(event="a3", a3_offset=4)),),
        ids_to_remove=(2,),
        ids=(rm.MeasIdToAddMod(1, 1, 1), rm.MeasIdToAddMod(2, 2, 1)),
        quantity=rm.QuantityConfigEutra(filter_coeff_rsrp=6),
        gaps=rm.MeasGapConfig(gap_offset=23, gp1=False),
        s_measure=70,
        speed_state=rm.SpeedStatePars(1, 2, 5, 10))
    _roundtrip(rm.pack_meas_config, rm.unpack_meas_config, m)


def test_mobility_control_info_minimal():
    m = rm.MobilityControlInfo(target_pci=101, new_ue_identity=0xBEEF)
    _roundtrip(rm.pack_mobility_control_info,
               rm.unpack_mobility_control_info, m)


def test_mobility_control_info_full():
    m = rm.MobilityControlInfo(
        target_pci=503, t304=4, new_ue_identity=0x1234,
        dl_carrier_freq=6300, ul_carrier_freq=24300,
        dl_bandwidth=5, ul_bandwidth=5, additional_spectrum_emission=1,
        rach_dedicated=(17, 0),
        rrc_common=rm.RadioResourceConfigCommonHO(
            prach_root_sequence_index=128,
            phich_duration_extended=False, phich_resource=2,
            pucch_delta_shift=1, pucch_n_rb_cqi=2, pucch_n_cs_an=6,
            pucch_n1_an=128, srs_setup=(3, 7, True),
            antenna_ports_count=1, p_max=23, tdd_config=None))
    _roundtrip(rm.pack_mobility_control_info,
               rm.unpack_mobility_control_info, m)


def test_security_config_ho():
    for s in (rm.SecurityConfigHO(),
              rm.SecurityConfigHO(key_change_indicator=True,
                                  next_hop_chaining_count=5,
                                  ciphering="eea2", integrity="eia2")):
        _roundtrip(rm.pack_security_config_ho,
                   rm.unpack_security_config_ho, s)


def test_reconfiguration_with_meas_config():
    msg = rd.RrcConnectionReconfiguration(
        rrc_ti=2,
        meas_config=rm.MeasConfig(
            objects=((1, rm.MeasObjectEutra(carrier_freq=2850)),),
            reports=((1, rm.ReportConfigEutra(event="a3", a3_offset=6,
                                              hysteresis=2,
                                              time_to_trigger=8)),),
            ids=(rm.MeasIdToAddMod(1, 1, 1),)))
    bits = rd.pack_dl_dcch(msg)
    got = rd.unpack_dl_dcch(bits)
    assert got == msg


def test_handover_command_roundtrip():
    """Full intra-LTE handover command: mobilityControlInfo +
    securityConfigHO + a DRB in radioResourceConfigDedicated."""
    msg = rd.RrcConnectionReconfiguration(
        rrc_ti=1,
        mobility=rm.MobilityControlInfo(
            target_pci=250, t304=3, new_ue_identity=0x5E11,
            rach_dedicated=(5, 0)),
        rrcd=rd.RadioResourceConfigDedicated(
            srb_to_add=(rd.SrbToAddMod(1),),
            drb_to_add=(rd.DrbToAddMod(eps_bearer_identity=5,
                                       drb_identity=1, lcid=3),)),
        sec_ho=rm.SecurityConfigHO(next_hop_chaining_count=2))
    bits = rd.pack_dl_dcch(msg)
    got = rd.unpack_dl_dcch(bits)
    assert got == msg


def test_reconfiguration_plain_still_works():
    msg = rd.RrcConnectionReconfiguration(rrc_ti=3, nas_list=(b"\x07\x42",))
    got = rd.unpack_dl_dcch(rd.pack_dl_dcch(msg))
    assert got == msg
