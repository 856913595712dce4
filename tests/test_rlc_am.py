"""RLC AM ARQ entities: in-order delivery over a lossy link."""

import numpy as np

from lteax.stack.rlc_am import AmTransmitter, AmReceiver
from lteax.stack import rlc_pdu


def _run_link(loss_pattern, n_sdus=20, max_rounds=50):
    tx = AmTransmitter(poll_every=4)
    rx = AmReceiver()
    sdus = [bytes([i]) * (10 + i % 5) for i in range(n_sdus)]
    for s in sdus:
        tx.submit(s)
    delivered = []
    drop_iter = iter(loss_pattern)
    for _ in range(max_rounds):
        # drain tx
        while True:
            pdu = tx.pull()
            if pdu is None:
                break
            drop = next(drop_iter, False)
            if not drop:
                rx.handle_pdu(pdu)
        delivered.extend(rx.take_delivered())
        status_raw = rx.make_status()
        if status_raw is not None:
            st = rlc_pdu.unpack_status(status_raw)
            tx.handle_status(st)
        if tx.all_acked and len(delivered) == n_sdus:
            break
        tx.poll_retransmit()   # idle + un-acked -> t-PollRetransmit
    return sdus, delivered, tx


def test_lossless_in_order():
    sdus, delivered, tx = _run_link([])
    assert delivered == sdus
    assert tx.all_acked


def test_lossy_retransmission():
    rng = np.random.default_rng(3)
    losses = list(rng.random(200) < 0.3)          # 30% PDU loss
    sdus, delivered, tx = _run_link(losses)
    assert delivered == sdus, f"{len(delivered)}/{len(sdus)} delivered"
    assert tx.all_acked


def test_burst_loss():
    losses = [False] * 3 + [True] * 6 + [False] * 100
    sdus, delivered, tx = _run_link(losses)
    assert delivered == sdus
    assert tx.all_acked


def test_stale_duplicate_ignored():
    """A duplicate of an already-delivered SN must not poison the window."""
    tx = AmTransmitter(poll_every=2)
    rx = AmReceiver()
    for i in range(4):
        tx.submit(bytes([i]) * 5)
    pdus = []
    while True:
        p = tx.pull()
        if p is None:
            break
        pdus.append(p)
    for p in pdus:
        rx.handle_pdu(p)
    assert len(rx.take_delivered()) == 4
    rx.handle_pdu(pdus[0])            # stale duplicate of SN 0
    st_raw = rx.make_status()
    st = rlc_pdu.unpack_status(st_raw)
    assert st.ack_sn == 4 and st.nack_sns == ()
