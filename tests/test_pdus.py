"""MAC/RLC/PDCP PDU codecs + pcap writer."""

import struct

from lteax.stack import mac_pdu, rlc_pdu, pdcp_pdu
from lteax.io.pcap import MacPcapWriter, LINKTYPE_USER1


def test_mac_pdu_roundtrip():
    sps = [
        mac_pdu.MacSubPdu(mac_pdu.LCID_TA_CMD, b"\x1f"),
        mac_pdu.MacSubPdu(0x01, b"hello-rrc"),
        mac_pdu.MacSubPdu(0x03, bytes(range(200))),
    ]
    pdu = mac_pdu.pack_mac_pdu(sps)
    back = mac_pdu.unpack_mac_pdu(pdu)
    assert [(s.lcid, s.payload) for s in back] == \
        [(s.lcid, s.payload) for s in sps]


def test_rar_roundtrip():
    rars = [mac_pdu.Rar(rapid=7, timing_advance=100, ul_grant=0x12345,
                        tc_rnti=0x003D),
            mac_pdu.Rar(rapid=33, timing_advance=2047, ul_grant=0xFFFFF,
                        tc_rnti=0xFFFF)]
    pdu = mac_pdu.pack_rar_pdu(rars, backoff=5)
    backoff, got = mac_pdu.unpack_rar_pdu(pdu)
    assert backoff == 5
    assert got == rars


def test_rlc_roundtrips():
    u = rlc_pdu.UmdPdu(sn=513, data=b"abc", fi=2)
    assert rlc_pdu.unpack_umd(rlc_pdu.pack_umd(u)) == u
    u5 = rlc_pdu.UmdPdu(sn=17, data=b"xy", sn_bits=5, fi=1)
    assert rlc_pdu.unpack_umd(rlc_pdu.pack_umd(u5), sn_bits=5) == u5
    a = rlc_pdu.AmdPdu(sn=700, data=b"payload", poll=True, fi=1)
    assert rlc_pdu.unpack_amd(rlc_pdu.pack_amd(a)) == a
    s = rlc_pdu.StatusPdu(ack_sn=512, nack_sns=(3, 700, 1023))
    assert rlc_pdu.unpack_status(rlc_pdu.pack_status(s)) == s
    # AMD parser rejects control PDUs
    assert rlc_pdu.unpack_amd(rlc_pdu.pack_status(s)) is None


def test_pdcp_roundtrips():
    s = pdcp_pdu.PdcpSrbPdu(sn=9, data=b"rrcmsg", mac_i=b"\x01\x02\x03\x04")
    assert pdcp_pdu.unpack_srb(pdcp_pdu.pack_srb(s)) == s
    d = pdcp_pdu.PdcpDrbPdu(sn=4000, data=b"ip-packet")
    assert pdcp_pdu.unpack_drb(pdcp_pdu.pack_drb(d)) == d
    d7 = pdcp_pdu.PdcpDrbPdu(sn=100, data=b"ip", sn_bits=7)
    assert pdcp_pdu.unpack_drb(pdcp_pdu.pack_drb(d7), sn_bits=7) == d7


def test_pcap_writer(tmp_path):
    p = str(tmp_path / "mac.pcap")
    with MacPcapWriter(p) as w:
        w.write(b"\x3d\x21\x04abcd", direction=1, rnti_type=4, rnti=0xFFFF,
                subframe=5, ts=1000.5)
        w.write(b"\x00" * 10, direction=0, rnti_type=3, rnti=0x003D, ts=1000.6)
    raw = open(p, "rb").read()
    magic, _maj, _min, _tz, _sig, _snap, dlt = struct.unpack("<IHHiIII",
                                                             raw[:24])
    assert magic == 0xA1B2C3D4 and dlt == LINKTYPE_USER1
    sec, usec, caplen, wirelen = struct.unpack("<IIII", raw[24:40])
    assert sec == 1000 and caplen == wirelen
    body = raw[40:40 + caplen]
    assert body[0] == 1          # FDD
    assert body[1] == 1          # DL
    assert body[2] == 4          # SI-RNTI type
    assert body[3] == 0x02 and body[4:6] == b"\xff\xff"


def test_prefetch_to_device():
    import numpy as np
    from lteax.io.iq import prefetch_to_device
    batches = [np.full((4, 2), i, np.float32) for i in range(5)]
    out = list(prefetch_to_device(iter(batches)))
    assert len(out) == 5
    for i, o in enumerate(out):
        assert float(np.asarray(o)[0, 0]) == i


def test_mac_padding_all_sizes():
    """36.321 padding: 1-2 bytes lead as subheaders; more trails as body."""
    sps = [mac_pdu.MacSubPdu(0x01, b"abcdef")]
    for target in (9, 10, 11, 12, 30):
        pdu = mac_pdu.pack_mac_pdu(sps, pad_to=target)
        assert len(pdu) == target, (target, len(pdu))
        back = [s for s in mac_pdu.unpack_mac_pdu(pdu)
                if s.lcid != mac_pdu.LCID_PADDING]
        assert [(s.lcid, s.payload) for s in back] == [(0x01, b"abcdef")], target
