"""RRC connection + NAS attach procedure engines (eNB <-> UE, byte level)."""

import pytest

from lteax.stack.rrc_proc import EnbRrc, UeRrc
from lteax.stack.users import Hss, UserManager

IMSI = (0, 0, 1, 0, 1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0)
K_HEX = "465b5ce8b199b49faa5f0a2ee238a6bc"
OPC_HEX = "cd63cb71954a9f4e48a5994e37a02baf"
RNTI = 0x3D


def _mk_hss():
    hss = Hss()
    hss.add_user("".join(map(str, IMSI)), K_HEX, OPC_HEX)
    return hss


def _pump(enb, ue, rnti):
    """Deliver messages until both sides go quiet."""
    queue = enb.on_ul_ccch(rnti, ue.connect())
    n = 0
    while queue:
        chan, raw = queue.pop(0)
        replies = (ue.on_dl_ccch(raw) if chan == "ccch"
                   else ue.on_dl_dcch(raw))
        for _, up in replies:
            queue.extend(enb.on_ul_dcch(rnti, up))
        n += 1
        assert n < 50, "attach did not converge"
    return n


def test_full_attach_flow():
    enb = EnbRrc(_mk_hss(), UserManager(), seed=11)
    ue = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    _pump(enb, ue, RNTI)

    assert ue.state == "connected"
    p = enb.proc(RNTI)
    assert p.state == "attach-done"
    # AS keys agree on both sides
    assert ue.k_enb == p.k_enb and len(ue.k_enb) == 32
    # default bearer configured end-to-end
    assert ue.ip == p.ip == (10, 0, 0, 2)
    assert ue.drb is not None and ue.drb.drb_identity == p.drb.drb_identity
    # eNB user context reflects the attach
    u = enb.users.find(RNTI)
    assert u.state == "connected" and u.imsi == "".join(map(str, IMSI))
    assert 3 in u.bearers and u.bearers[3].mode == "um"
    assert "aka-success" in enb.events
    assert "nas-security-activated" in enb.events
    # UE capability transfer ran before the reconfiguration
    assert p.ue_caps is not None and p.ue_caps.ue_category == 3
    assert any(e.startswith("ue-caps") for e in enb.events)
    assert any(e.startswith("caps-enquiry") for e in ue.events)
    assert any(e.startswith("attach-complete") for e in enb.events)
    assert any(e.startswith("attach-accept") for e in ue.events)


def test_emm_information_pushed_after_attach():
    enb = EnbRrc(_mk_hss(), UserManager(), network_name="TestNet", seed=11)
    ue = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    _pump(enb, ue, RNTI)
    assert ue.network_name == "TestNet"


def test_ue_initiated_detach():
    enb = EnbRrc(_mk_hss(), UserManager(), seed=11)
    ue = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    _pump(enb, ue, RNTI)
    assert ue.state == "connected"
    queue = []
    for _, up in ue.detach():
        queue.extend(enb.on_ul_dcch(RNTI, up))
    # eNB answers DetachAccept + RRCConnectionRelease
    for chan, raw in queue:
        ue.on_dl_dcch(raw)
    assert "detach-accept" in ue.events
    assert ue.state == "idle"              # release processed
    assert enb.proc(RNTI).state == "detached"
    assert enb.users.find(RNTI).state == "idle"
    assert "detach-request" in enb.events


def test_unknown_imsi_released():
    enb = EnbRrc(Hss(), UserManager(), seed=11)   # empty HSS
    ue = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    _pump(enb, ue, RNTI)
    assert ue.state == "idle"
    assert any(e.startswith("attach-reject") for e in enb.events)
    assert any(e.startswith("released") for e in ue.events)


def test_wrong_key_fails_autn():
    """A UE with the wrong K must reject the network (AUTN MAC check)."""
    enb = EnbRrc(_mk_hss(), UserManager(), seed=11)
    ue = UeRrc(IMSI, bytes(16), bytes.fromhex(OPC_HEX))
    with pytest.raises(ValueError, match="AUTN"):
        _pump(enb, ue, RNTI)


def test_two_ues_get_distinct_ips():
    hss = _mk_hss()
    imsi2 = IMSI[:-1] + (1,)
    hss.add_user("".join(map(str, imsi2)), K_HEX, OPC_HEX)
    enb = EnbRrc(hss, UserManager(), seed=11)
    ue1 = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    ue2 = UeRrc(imsi2, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    _pump(enb, ue1, 0x3D)
    _pump(enb, ue2, 0x3E)
    assert ue1.ip == (10, 0, 0, 2) and ue2.ip == (10, 0, 0, 3)
    assert ue1.k_enb != ue2.k_enb


def test_reestablishment_after_attach():
    """RLF recovery: attach, then reestablish on a new C-RNTI with a valid
    shortMAC-I; the eNB moves the UE context and resumes the session."""
    enb = EnbRrc(_mk_hss(), UserManager(), seed=7)
    ue = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    _pump(enb, ue, RNTI)
    assert ue.state == "connected"

    new_rnti = RNTI + 1
    queue = enb.on_ul_ccch(new_rnti, ue.reestablish(c_rnti=RNTI,
                                                    cause="otherFailure"))
    while queue:
        chan, raw = queue.pop(0)
        replies = (ue.on_dl_ccch(raw) if chan == "ccch"
                   else ue.on_dl_dcch(raw))
        for _, up in replies:
            queue.extend(enb.on_ul_dcch(new_rnti, up))
    assert ue.state == "connected"
    assert any(e.startswith("reestablished") for e in ue.events)
    assert "reestablishment-complete" in enb.events
    # context moved to the new C-RNTI and resumed its pre-failure state
    assert enb.proc(RNTI) is None
    p = enb.proc(new_rnti)
    assert p is not None and p.state == "attach-done"


def test_reestablishment_rejected_without_context():
    """A reestablishment request for an unknown C-RNTI (or wrong shortMAC-I)
    gets RRCConnectionReestablishmentReject — the reference eNB's behavior."""
    enb = EnbRrc(_mk_hss(), UserManager(), seed=7)
    ue = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    _pump(enb, ue, RNTI)

    # unknown C-RNTI
    out = enb.on_ul_ccch(0x99, ue.reestablish(c_rnti=0x77))
    assert len(out) == 1 and out[0][0] == "ccch"
    ue.state = "wait-reestablishment"
    ue.on_dl_ccch(out[0][1])
    assert ue.state == "idle"
    assert "reestablishment-rejected" in ue.events

    # known C-RNTI but corrupted shortMAC-I
    ue2 = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    ue2.k_enb = bytes(32)          # wrong key -> wrong shortMAC-I
    out = enb.on_ul_ccch(0x9A, ue2.reestablish(c_rnti=RNTI))
    ue2.state = "wait-reestablishment"
    ue2.on_dl_ccch(out[0][1])
    assert ue2.state == "idle"
    assert any("bad-short-mac" in e for e in enb.events)
    # the original context survives a failed hijack attempt
    assert enb.proc(RNTI) is not None


def test_measurement_report_and_smc_failure_events():
    from lteax.stack import rrc_dedicated as rd
    enb = EnbRrc(_mk_hss(), UserManager(), seed=3)
    ue = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    _pump(enb, ue, RNTI)
    (_, raw), = ue.measurement_report(
        meas_id=2, serv_rsrp=70, serv_rsrq=25,
        neigh=(rd.MeasResultEutra(phys_cell_id=3, rsrp=40),))
    assert enb.on_ul_dcch(RNTI, raw) == []
    assert any(e.startswith("meas-report id=2") and "neigh=[3]" in e
               for e in enb.events)


def test_measurement_driven_handover():
    """A3 meas config -> UE MeasurementReport -> handover command with
    mobilityControlInfo/securityConfigHO -> complete on the target C-RNTI,
    with KeNB* chained identically on both sides (33.401 A.5)."""
    from lteax.stack.rrc_dedicated import MeasResultEutra

    enb = EnbRrc(_mk_hss(), UserManager(), seed=11)
    ue = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    _pump(enb, ue, RNTI)
    k_before = ue.k_enb

    enb.neighbors[350] = 6300          # PCI 350 lives on EARFCN 6300
    (chan, raw), = enb.configure_measurements(RNTI)
    assert chan == "dcch"
    replies = ue.on_dl_dcch(raw)
    assert ue.meas_config is not None
    assert ue.meas_config.reports[0][1].event == "a3"
    for _, up in replies:
        assert enb.on_ul_dcch(RNTI, up) == []

    # neighbour 350 stronger than serving -> eNB issues the HO command
    (_, rep), = ue.measurement_report(
        1, serv_rsrp=50, serv_rsrq=20, neigh=(MeasResultEutra(350, rsrp=60),))
    cmds = enb.on_ul_dcch(RNTI, rep)
    assert len(cmds) == 1
    assert any(e.startswith("handover-command") for e in enb.events)

    replies = ue.on_dl_dcch(cmds[0][1])
    new_rnti = ue.c_rnti
    assert new_rnti is not None and new_rnti != RNTI
    assert enb.proc(RNTI) is None
    p = enb.proc(new_rnti)
    assert p is not None and p.state == "wait-ho-complete"

    # ReconfigurationComplete lands on the target cell / new C-RNTI
    (_, up), = replies
    assert enb.on_ul_dcch(new_rnti, up) == []
    assert p.state == "attach-done"
    assert "handover-complete" in enb.events
    # keys refreshed and equal on both sides
    assert ue.k_enb == p.k_enb and ue.k_enb != k_before


def test_explicit_handover_no_measurements():
    enb = EnbRrc(_mk_hss(), UserManager(), seed=11)
    ue = UeRrc(IMSI, bytes.fromhex(K_HEX), bytes.fromhex(OPC_HEX))
    _pump(enb, ue, RNTI)
    cmds = enb.start_handover(RNTI, target_pci=17, new_rnti=0x99,
                              target_earfcn=2850, preamble=11)
    replies = ue.on_dl_dcch(cmds[0][1])
    assert ue.c_rnti == 0x99
    assert any("preamble=(11, 0)" in e for e in ue.events)
    assert enb.on_ul_dcch(0x99, replies[0][1]) == []
    assert enb.proc(0x99).state == "attach-done"
    assert ue.k_enb == enb.proc(0x99).k_enb
