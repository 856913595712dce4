"""MAC DL scheduler: SI windows, RAR, round-robin fairness, TBS fitting."""

from lteax.stack.mac_sched import DlScheduler, SI_RNTI
from lteax.stack import mac_pdu


def test_si_scheduling():
    s = DlScheduler(n_rb_dl=25)
    sib1 = b"\x01" * 20
    si = b"\x02" * 30
    g_even = s.schedule(0, 5, sib1=sib1, si=si)
    assert g_even[0].rnti == SI_RNTI and g_even[0].kind == "sib1"
    assert g_even[0].tbs >= 8 * len(sib1)
    g_odd = s.schedule(1, 5, sib1=sib1, si=si)
    assert g_odd[0].kind == "si"
    assert s.schedule(0, 3) == []            # nothing outside subframe 5


def test_rar_after_prach():
    s = DlScheduler(n_rb_dl=25)
    tc = s.on_prach(rapid=17)
    grants = s.schedule(2, 1)
    assert len(grants) == 1 and grants[0].kind == "rar"
    _, rars = mac_pdu.unpack_rar_pdu(grants[0].payload)
    assert rars[0].rapid == 17 and rars[0].tc_rnti == tc


def test_round_robin_fairness_and_drain():
    s = DlScheduler(n_rb_dl=25)
    for rnti in (0x10, 0x11, 0x12):
        s.add_ue(rnti, cqi_mcs=9)
        for i in range(10):
            s.enqueue(rnti, bytes([rnti & 0xFF]) * 40)
    served = {0x10: 0, 0x11: 0, 0x12: 0}
    for tti in range(60):
        for g in s.schedule(tti // 10, tti % 10):
            if g.kind == "data":
                served[g.rnti] += 1
                # payload parses back into whole SDUs
                subs = mac_pdu.unpack_mac_pdu(g.payload)
                assert any(sp.lcid == 0x03 for sp in subs)
        if all(not u.buffered for u in s.ues.values()):
            break
    assert all(not u.buffered for u in s.ues.values())
    counts = sorted(served.values())
    assert counts[0] > 0 and counts[-1] - counts[0] <= 2   # fair-ish


def test_no_overlapping_prbs():
    s = DlScheduler(n_rb_dl=15, si_prbs=6)
    s.add_ue(0x20)
    s.enqueue(0x20, b"x" * 100)
    s.on_prach(3)
    grants = s.schedule(0, 5, sib1=b"s" * 10, si=b"t" * 10)
    spans = sorted((g.rb_start, g.rb_start + g.n_prb) for g in grants)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0, spans
    assert max(s1 for _, s1 in spans) <= 15
