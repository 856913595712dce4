"""RLC UM reordering entity (36.322 §5.1.2)."""

from lteax.stack.rlc_um import UmTransmitter, UmReceiver


def _pipe(n, sn_bits=10):
    tx = UmTransmitter(sn_bits=sn_bits)
    sdus = [bytes([i & 0xFF]) * 3 for i in range(n)]
    return tx, sdus, [None] * 0


def test_in_order_delivery():
    tx = UmTransmitter()
    rx = UmReceiver()
    sdus = [b"a", b"b", b"c", b"d"]
    for s in sdus:
        rx.handle_pdu(tx.send(s))
    assert rx.take_delivered() == sdus
    assert rx.vr_ur == 4 and rx.vr_ux is None


def test_reorder_within_window():
    tx = UmTransmitter()
    rx = UmReceiver()
    pdus = [tx.send(bytes([i])) for i in range(5)]
    rx.handle_pdu(pdus[0])
    rx.handle_pdu(pdus[2])            # gap at SN 1 -> t-Reordering armed
    rx.handle_pdu(pdus[4])
    assert rx.take_delivered() == [bytes([0])]
    assert rx.vr_ux is not None
    rx.handle_pdu(pdus[1])
    rx.handle_pdu(pdus[3])
    assert rx.take_delivered() == [bytes([i]) for i in (1, 2, 3, 4)]


def test_t_reordering_expiry_skips_gap():
    tx = UmTransmitter()
    rx = UmReceiver(t_reordering_ticks=5)
    pdus = [tx.send(bytes([i])) for i in range(4)]
    rx.handle_pdu(pdus[0])
    rx.handle_pdu(pdus[2])            # SN 1 lost
    rx.handle_pdu(pdus[3])
    assert rx.take_delivered() == [bytes([0])]
    rx.tick(4)
    assert rx.take_delivered() == []  # not yet expired
    rx.tick(1)                        # expiry: skip SN 1
    assert rx.take_delivered() == [bytes([2]), bytes([3])]
    assert rx.vr_ur == rx.vr_uh == 4


def test_duplicate_and_stale_discard():
    tx = UmTransmitter()
    rx = UmReceiver()
    p0 = tx.send(b"x")
    p1 = tx.send(b"y")
    rx.handle_pdu(p0)
    rx.handle_pdu(p0)                 # duplicate of delivered SN -> stale
    rx.handle_pdu(p1)
    rx.handle_pdu(p1)
    assert rx.take_delivered() == [b"x", b"y"]


def test_sn_wrap():
    tx = UmTransmitter(sn_bits=5)
    rx = UmReceiver(sn_bits=5)
    n = 100                            # 3x wrap of the 32-SN space
    sdus = [bytes([i & 0xFF, (i >> 8) & 0xFF]) for i in range(n)]
    got = []
    for s in sdus:
        rx.handle_pdu(tx.send(s))
        got.extend(rx.take_delivered())
    assert got == sdus


def test_window_advance_on_burst_loss():
    """A long loss burst: the window edge moves and later data still flows
    once t-Reordering expires."""
    tx = UmTransmitter()
    rx = UmReceiver(t_reordering_ticks=2)
    pdus = [tx.send(bytes([i])) for i in range(30)]
    rx.handle_pdu(pdus[0])
    for p in pdus[20:]:                # SNs 1..19 lost
        rx.handle_pdu(p)
    assert rx.take_delivered() == [bytes([0])]
    rx.tick(2)
    assert rx.take_delivered() == [bytes([i]) for i in range(20, 30)]


def test_bearer_rlc_factory():
    from lteax.stack.users import UserManager
    um_mgr = UserManager()
    u = um_mgr.add_user("001010000000007")
    srb = u.add_bearer(1, "am")
    drb = u.add_bearer(5, "um", lcid=3)
    atx, arx = srb.make_rlc()
    utx, urx = drb.make_rlc()
    # loop one SDU through each
    atx.submit(b"sig")
    arx.handle_pdu(atx.pull())
    assert arx.take_delivered() == [b"sig"]
    urx.handle_pdu(utx.send(b"data"))
    assert urx.take_delivered() == [b"data"]
    assert u.add_bearer(2, "tm").make_rlc() == (None, None)
