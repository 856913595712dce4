"""Software eNB TTI loop: DL user-plane through scheduler/RLC/PDCP/PHY."""

import numpy as np

from lteax.apps.enb_sim import EnbSim, UeSim
from lteax.apps.file_gen import GenConfig
import pytest

K1 = bytes(range(32))
K2 = bytes(range(1, 33))


def _run(enb, ues, n_frames=2, drop=None):
    """Run TTIs; drop = set of (sfn, sf) grids lost before the UE."""
    for sfn in range(n_frames):
        for sf in range(10):
            grid = enb.tti_grid(sfn, sf)
            if drop and (sfn, sf) in drop:
                continue
            for rnti, ue in ues.items():
                status = ue.handle_grid(grid, sf)
                if status is not None:
                    enb.handle_status(rnti, status)


@pytest.mark.heavy
def test_two_ue_user_plane():
    gc = GenConfig(n_rb_dl=6, n_cell_id=77)
    enb = EnbSim(gc)
    enb.add_ue(0x100, K1)
    enb.add_ue(0x200, K2)
    ue1 = UeSim(gc, 0x100, K1)
    ue2 = UeSim(gc, 0x200, K2)
    enb.send_rrc(0x100, b"rrc-reconfig-ue1")
    enb.send_data(0x100, b"ip-ue1-a")
    enb.send_data(0x100, b"ip-ue1-b")
    enb.send_data(0x200, b"ip-ue2")
    _run(enb, {0x100: ue1, 0x200: ue2})
    assert ue1.rrc_sdus == [b"rrc-reconfig-ue1"]
    assert ue1.data_sdus == [b"ip-ue1-a", b"ip-ue1-b"]
    assert ue2.data_sdus == [b"ip-ue2"]
    # isolation: UE2 never saw UE1 traffic
    assert ue2.rrc_sdus == []
    assert enb.ues[0x100].srb_tx.all_acked


@pytest.mark.heavy
def test_srb_survives_lost_subframe():
    """Drop the subframe carrying the first SRB transmission: RLC AM
    status/retransmission recovers it."""
    gc = GenConfig(n_rb_dl=6, n_cell_id=77)
    enb = EnbSim(gc)
    enb.add_ue(0x100, K1)
    ue = UeSim(gc, 0x100, K1)
    enb.send_rrc(0x100, b"must-arrive")
    # first data-eligible subframe is (0, 1)
    _run(enb, {0x100: ue}, n_frames=1, drop={(0, 1)})
    assert ue.rrc_sdus == []              # lost, not yet recovered
    enb.ues[0x100].srb_tx.poll_retransmit()
    _run(enb, {0x100: ue}, n_frames=1)
    assert ue.rrc_sdus == [b"must-arrive"]


def test_uplink_pusch_leg():
    gc = GenConfig(n_rb_dl=6, n_cell_id=77)
    enb = EnbSim(gc)
    enb.add_ue(0x100, K1)
    ue = UeSim(gc, 0x100, K1)
    for i in range(3):
        ue.send_ul(f"ul-report-{i}".encode())
    for sf in range(1, 5):
        g = ue.ul_tti_grid(sf)
        if g is None:
            break
        enb.handle_pusch(0x100, g, sf)
    assert enb.ues[0x100].ul_sdus == [b"ul-report-0", b"ul-report-1",
                                      b"ul-report-2"]


def test_phich_loopback_orthogonality():
    import numpy as np
    from lteax.phy.channels import phich
    cid, sf = 211, 4
    sym = phich.phich_group_encode({2: 1, 5: 0}, cid, sf)
    assert sym.shape == (12,)
    m2 = phich.phich_group_decode(sym, cid, sf, 2)
    m5 = phich.phich_group_decode(sym, cid, sf, 5)
    m0 = phich.phich_group_decode(sym, cid, sf, 0)
    assert m2 < 0 and m5 > 0              # ACK / NACK recovered
    assert abs(m0) < 1e-4 * max(abs(m2), abs(m5))   # orthogonal sequence


def test_phich_grid_placement_disjoint():
    import numpy as np
    from lteax.phy.config import PhyConfig
    from lteax.phy.grid import (phich_flat_idx, pcfich_flat_idx,
                                n_phich_groups)
    cfg = PhyConfig(n_rb_dl=6)
    cid, ng = 211, 1.0
    pc = set(pcfich_flat_idx(cfg, cid).tolist())
    seen = set()
    for g in range(n_phich_groups(cfg, ng)):
        idx = phich_flat_idx(cfg, cid, ng, g)
        assert len(idx) == 12
        s = set(idx.tolist())
        assert not (s & pc) and not (s & seen)
        seen |= s


def test_ul_with_phich_feedback():
    from lteax.apps.enb_sim import EnbSim, UeSim
    from lteax.apps.file_gen import GenConfig
    gc = GenConfig(n_rb_dl=6, n_cell_id=77)
    K = bytes(range(32))
    enb = EnbSim(gc)
    enb.add_ue(0x100, K)
    ue = UeSim(gc, 0x100, K)
    ue.send_ul(b"measurement-report")
    g_ul = ue.ul_tti_grid(2)
    enb.handle_pusch(0x100, g_ul, 2)
    assert enb.ues[0x100].ul_sdus == [b"measurement-report"]
    dl = enb.tti_grid(0, 3)                   # PHICH rides the next DL grid
    assert ue.read_phich(dl, 3, n_seq=0) is True
    # and a grid without PHICH reads as NACK-ish / not-ACK
    dl2 = enb.tti_grid(0, 4)
    assert ue.read_phich(dl2, 4, n_seq=0) is False


@pytest.mark.heavy
def test_rrc_attach_over_tti_loop():
    """A UE attaches through the live TTI scheduler: PRACH -> CCCH
    connection setup -> SRB1 RRC/NAS exchange (AM + PDCP, pre-security then
    EIA2/EEA2 after the AS SecurityModeCommand) -> DRB user plane."""
    from lteax.stack.rrc_proc import EnbRrc, UeRrc
    from lteax.stack.users import Hss, UserManager

    imsi = (0, 0, 1, 0, 1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0)
    k = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
    opc = bytes.fromhex("cd63cb71954a9f4e48a5994e37a02baf")
    hss = Hss()
    hss.add_user("".join(map(str, imsi)), k.hex(), opc.hex())

    gc = GenConfig(n_rb_dl=6, n_cell_id=77)
    enb = EnbSim(gc, rrc=EnbRrc(hss, UserManager(), seed=5))
    rnti = enb.handle_prach(rapid=7)
    ue = UeSim(gc, rnti, rrc_ue=UeRrc(imsi, k, opc))
    ue.start_attach()

    done = False
    for sfn in range(5):
        for sf in range(10):
            g_ul = ue.ul_tti_grid(sf)
            if g_ul is not None:
                enb.handle_pusch(rnti, g_ul, sf)
            grid = enb.tti_grid(sfn, sf)
            status = ue.handle_grid(grid, sf)
            if status is not None:
                enb.handle_status(rnti, status)
            p = enb.rrc.proc(rnti)
            if ue.rrc_ue.state == "connected" and p is not None \
                    and p.state == "attach-done":
                done = True
                break
        if done:
            break
    assert done, (ue.rrc_ue.state, enb.rrc.events)
    assert ue.sec_on and enb.ues[rnti].sec_on
    assert ue.rrc_ue.ip == (10, 0, 0, 2)
    assert any(e.startswith("attach-complete") for e in enb.rrc.events)

    # user plane now flows through the normal bearer path, ciphered
    enb.send_data(rnti, b"post-attach-dl-ip")
    ue.send_ul(b"post-attach-ul-ip")
    for sfn in range(5, 7):
        for sf in range(10):
            g_ul = ue.ul_tti_grid(sf)
            if g_ul is not None:
                enb.handle_pusch(rnti, g_ul, sf)
            ue.handle_grid(enb.tti_grid(sfn, sf), sf)
    assert ue.data_sdus == [b"post-attach-dl-ip"]
    assert enb.ues[rnti].ul_sdus == [b"post-attach-ul-ip"]


def test_cqi_report_link_adaptation():
    """Periodic wideband CQI loop: UE measures SNR from the CRS, reports
    on PUCCH format 2 (m=2), the eNB scheduler adapts its MCS cap."""
    from lteax.stack.mac_sched import CQI_TO_MCS
    gc = GenConfig(n_rb_dl=6, n_cell_id=77)
    enb = EnbSim(gc)
    enb.add_ue(0x100, K1, cqi_mcs=9)
    ue = UeSim(gc, 0x100, K1, cqi_period=1)
    rng = np.random.default_rng(7)

    # clean DL grid -> high SNR -> CQI 15 -> MCS cap 28
    grid = enb.tti_grid(0, 1)
    ue.handle_grid(grid, 1)
    assert ue.meas_cqi == 15
    g_ul = ue.ul_tti_grid(2)
    assert g_ul is not None
    enb.handle_pusch(0x100, g_ul, 2)
    assert enb.sched.ues[0x100].cqi_mcs == CQI_TO_MCS[15]

    # noisy DL grid (~3 dB SNR) -> mid-range CQI -> lower MCS cap
    noisy = np.asarray(enb.tti_grid(0, 3)).astype(np.complex64)
    nv = 10 ** (-3 / 10)
    noisy += (rng.normal(size=noisy.shape) + 1j * rng.normal(
        size=noisy.shape)).astype(np.complex64) * np.sqrt(nv / 2)
    ue.handle_grid(noisy, 3)
    assert ue.meas_cqi is not None and 3 <= ue.meas_cqi <= 9
    g_ul = ue.ul_tti_grid(4)
    enb.handle_pusch(0x100, g_ul, 4)
    assert enb.sched.ues[0x100].cqi_mcs == CQI_TO_MCS[ue.meas_cqi]
    assert enb.sched.ues[0x100].cqi_mcs < CQI_TO_MCS[15]


def test_pucch_sr_grant_and_harq_ack_loop():
    """UL control loop: UE without a standing grant raises an SR on PUCCH
    m=1, the eNB answers with a DCI-0 UL grant, the UE then sends PUSCH;
    HARQ ACK/NACK on PUCCH m=0 drives DL MAC retransmission."""
    gc = GenConfig(n_rb_dl=6, n_cell_id=77)
    enb = EnbSim(gc)
    enb.add_ue(0x100, K1)
    ue = UeSim(gc, 0x100, K1, standing_grant=False)
    ue.send_ul(b"ul-needs-grant")
    assert not ue.granted

    # TTI 1: UE sends SR-only grid; eNB detects it
    g_ul = ue.ul_tti_grid(1)
    assert g_ul is not None and g_ul.shape == (14, 72)
    enb.handle_pusch(0x100, g_ul, 1)
    assert 0x100 in enb._sr_pending
    assert enb.ues[0x100].ul_sdus == []    # SR-only: no data decoded yet

    # TTI 2: eNB DL carries the DCI-0 grant; UE decodes it
    grid = enb.tti_grid(0, 2)
    ue.handle_grid(grid, 2)
    assert ue.granted

    # TTI 3: UE now transmits PUSCH; eNB decodes the UL SDU
    g_ul = ue.ul_tti_grid(3)
    enb.handle_pusch(0x100, g_ul, 3)
    assert enb.ues[0x100].ul_sdus == [b"ul-needs-grant"]

    # --- HARQ feedback: corrupt a DL data subframe -> NACK -> retx ---
    enb.send_data(0x100, b"harq-payload")
    grid = enb.tti_grid(0, 4)              # carries the DL TB
    assert 0x100 in enb._last_dl
    noisy = np.asarray(grid).copy()        # corrupt PDSCH, keep PDCCH
    noisy[4:] += 10.0
    ue.handle_grid(noisy, 4)
    assert ue.pending_ack == 0             # CRC failed -> NACK queued
    g_ul = ue.ul_tti_grid(6)               # PUCCH NACK (no UL data left)
    enb.handle_pusch(0x100, g_ul, 6)
    # NACK requeued the MAC SDUs; next TTI retransmits
    grid = enb.tti_grid(0, 7)
    ue.handle_grid(grid, 7)
    assert ue.data_sdus == [b"harq-payload"]
    assert ue.pending_ack == 1             # ACK for the retransmission
    g_ul = ue.ul_tti_grid(8)
    enb.handle_pusch(0x100, g_ul, 8)
    assert 0x100 not in enb._last_dl       # ACK cleared the retx buffer


def test_simultaneous_ack_and_cqi_on_format_2a():
    """When a HARQ ACK collides with the periodic CQI report, the UE
    multiplexes both on PUCCH format 2a and the eNB (which knows it is
    awaiting an ACK) recovers the ACK and the CQI from one resource."""
    from lteax.stack.mac_sched import CQI_TO_MCS
    gc = GenConfig(n_rb_dl=6, n_cell_id=77)
    enb = EnbSim(gc)
    enb.add_ue(0x100, K1, cqi_mcs=9)
    ue = UeSim(gc, 0x100, K1, cqi_period=1)

    # prime a DL transmission awaiting ACK and a CQI measurement
    enb.send_data(0x100, b"payload-awaiting-ack")
    grid = enb.tti_grid(0, 1)
    ue.handle_grid(grid, 1)
    assert ue.pending_ack == 1 and ue.meas_cqi == 15
    assert 0x100 in enb._last_dl

    g_ul = ue.ul_tti_grid(2)
    assert g_ul is not None
    # the format-1 ACK resource must be empty (everything rode format 2a)
    from lteax.phy.channels import pucch as pucch_mod
    from lteax.apps.enb_sim import PUCCH_M_F1
    assert not pucch_mod.pucch_present(np.asarray(g_ul), PUCCH_M_F1, 6)

    enb.handle_pusch(0x100, g_ul, 2)
    # ACK consumed the pending copy; CQI reached the scheduler
    assert 0x100 not in enb._last_dl
    assert enb.sched.ues[0x100].cqi_mcs == CQI_TO_MCS[15]


def test_nack_on_format_2a_requeues():
    """NACK multiplexed on format 2a still triggers MAC retransmission."""
    gc = GenConfig(n_rb_dl=6, n_cell_id=77)
    enb = EnbSim(gc)
    enb.add_ue(0x100, K1, cqi_mcs=9)
    ue = UeSim(gc, 0x100, K1, cqi_period=1)
    rng = np.random.default_rng(3)

    enb.send_data(0x100, b"will-be-corrupted")
    grid = np.asarray(enb.tti_grid(0, 1)).astype(np.complex64)
    noisy = grid + 0.5 * (rng.normal(size=grid.shape)
                          + 1j * rng.normal(size=grid.shape)).astype(
                              np.complex64)
    ue.handle_grid(noisy, 1)
    if ue.pending_ack != 0:       # ensure the decode really failed
        ue.pending_ack = 0
    before = len(enb.sched.ues[0x100].queue)
    g_ul = ue.ul_tti_grid(2)
    enb.handle_pusch(0x100, g_ul, 2)
    assert 0x100 not in enb._last_dl
    assert len(enb.sched.ues[0x100].queue) > before   # SDUs requeued
