"""Software eNB TTI loop: DL user-plane through scheduler/RLC/PDCP/PHY."""

import numpy as np

from lteax.apps.enb_sim import EnbSim, UeSim
from lteax.apps.file_gen import GenConfig

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
