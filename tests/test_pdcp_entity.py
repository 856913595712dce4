"""PDCP entity: COUNT/HFN state + EIA2/EEA2 over the PDU codecs."""

from lteax.stack.pdcp import PdcpEntity, srb_pair
from lteax.stack.security import generate_as_keys

K_ENB = bytes(range(32))


def _keys():
    return generate_as_keys(K_ENB)


def test_srb_roundtrip_with_sn_wrap():
    k_enc, k_int, _ = _keys()
    enb, ue = srb_pair(1, k_enc, k_int)
    for i in range(70):                      # > 2 wraps of the 5-bit SN
        msg = f"rrc-{i}".encode()
        pdu = enb.encode(msg)
        assert pdu != bytes([pdu[0]]) + msg + pdu[-4:]   # actually ciphered
        got = ue.decode(pdu)
        assert got == msg, i
    assert enb.tx_count == 70 and ue.rx_next == 70


def test_srb_integrity_failure_returns_none():
    k_enc, k_int, _ = _keys()
    enb, ue = srb_pair(1, k_enc, k_int)
    pdu = bytearray(enb.encode(b"hello"))
    pdu[2] ^= 0x40                           # flip a ciphertext bit
    assert ue.decode(bytes(pdu)) is None
    # clean PDU still passes (state not corrupted by the bad one)
    assert ue.decode(enb.encode(b"again")) == b"again"


def test_srb_wrong_key_rejected():
    k_enc, k_int, _ = _keys()
    enb, _ = srb_pair(1, k_enc, k_int)
    other = generate_as_keys(bytes(32))
    _, ue = srb_pair(1, other[0], other[1])
    assert ue.decode(enb.encode(b"secret")) is None


def test_drb_ciphered_roundtrip_and_hfn():
    _, _, k_up = _keys()
    enb = PdcpEntity(srb=False, rb_id=5, direction_tx=1, k_enc=k_up)
    ue = PdcpEntity(srb=False, rb_id=5, direction_tx=0, k_enc=k_up)
    # jump both sides near the 12-bit wrap to exercise HFN inference
    enb.tx_count = 4090
    ue.rx_next = 4090
    for i in range(12):                      # crosses COUNT 4096 (HFN 0->1)
        msg = f"ip-packet-{i}".encode()
        pdu = enb.encode(msg)
        assert msg not in pdu                # payload is ciphered
        assert ue.decode(pdu) == msg, i
    assert ue.rx_next == 4102


def test_drb_7bit_sn():
    _, _, k_up = _keys()
    enb = PdcpEntity(srb=False, rb_id=6, direction_tx=1, k_enc=k_up,
                     sn_bits=7)
    ue = PdcpEntity(srb=False, rb_id=6, direction_tx=0, k_enc=k_up,
                    sn_bits=7)
    for i in range(300):                     # > 2 wraps of the 7-bit SN
        msg = bytes([i & 0xFF]) * 5
        assert ue.decode(enb.encode(msg)) == msg, i


def test_srb_pre_security_then_key_activation():
    """SRB1 before the AS SecurityModeCommand: zero MAC-I, no verification;
    set_keys() upgrades both sides mid-stream (36.331 §5.3.1.1)."""
    enb = PdcpEntity(srb=True, rb_id=1, direction_tx=1)
    ue = PdcpEntity(srb=True, rb_id=1, direction_tx=0)
    raw = enb.encode(b"rrc-setup-era")
    assert raw[-4:] == b"\x00\x00\x00\x00"
    assert ue.decode(raw) == b"rrc-setup-era"

    ke, ki, _ = generate_as_keys(bytes(range(32)))
    enb.set_keys(ke, ki)
    ue.set_keys(ke, ki)
    raw = enb.encode(b"protected-era")
    assert raw[-4:] != b"\x00\x00\x00\x00"   # ciphered body + real MAC-I
    assert ue.decode(raw) == b"protected-era"

    # tampering is now caught
    bad = raw[:1] + bytes([raw[1] ^ 0xFF]) + raw[2:]
    assert ue.decode(bad) is None
