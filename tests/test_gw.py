"""GW (TUN gateway) — reference ``LTE_fdd_enb_gw`` parity (SURVEY §2.3).

The crown jewel test sends a REAL kernel ICMP echo request through the TUN
device, across the simulated air interface (PDCP/RLC/MAC/PHY OFDM grids,
SR -> DCI-0 grant -> PUSCH), and receives the UE's echo reply back through
the kernel.
"""

import os
import socket
import struct
import time

import numpy as np
import pytest

from lteax.stack.gw import (GwLoop, ipv4_dst, ipv4_icmp_echo_reply)


def _icmp_echo(src, dst, ident=0x1234, seq=1, payload=b"lteax-ping"):
    icmp = bytearray(struct.pack(">BBHHH", 8, 0, 0, ident, seq) + payload)
    cs = 0
    buf = icmp + (b"\x00" if len(icmp) % 2 else b"")
    for i in range(0, len(buf), 2):
        cs += (buf[i] << 8) | buf[i + 1]
    cs = (cs & 0xFFFF) + (cs >> 16)
    icmp[2:4] = struct.pack(">H", ~cs & 0xFFFF)
    total = 20 + len(icmp)
    ip = bytearray(struct.pack(">BBHHHBBH4s4s", 0x45, 0, total, 1, 0, 64, 1,
                               0, bytes(src), bytes(dst)))
    cs = 0
    for i in range(0, 20, 2):
        cs += (ip[i] << 8) | ip[i + 1]
    cs = (cs & 0xFFFF) + (cs >> 16)
    ip[10:12] = struct.pack(">H", ~cs & 0xFFFF)
    return bytes(ip) + bytes(icmp)


def test_ipv4_helpers():
    pkt = _icmp_echo((10, 0, 0, 1), (10, 0, 0, 2))
    assert ipv4_dst(pkt) == (10, 0, 0, 2)
    assert ipv4_dst(b"\x60" + bytes(39)) is None          # IPv6
    rep = ipv4_icmp_echo_reply(pkt)
    assert rep is not None
    assert ipv4_dst(rep) == (10, 0, 0, 1)                 # swapped
    ihl = (rep[0] & 0xF) * 4
    assert rep[ihl] == 0                                  # echo reply
    assert rep[ihl + 4:] == pkt[ihl + 4:]                 # id/seq/payload
    # non-echo is ignored
    assert ipv4_icmp_echo_reply(rep) is None
    assert ipv4_icmp_echo_reply(b"junk") is None


def test_gwloop_routing():
    gw = GwLoop()
    got = []
    gw.add_route((10, 0, 0, 2), got.append)
    p2 = _icmp_echo((10, 0, 0, 1), (10, 0, 0, 2))
    p9 = _icmp_echo((10, 0, 0, 1), (10, 0, 0, 9))
    gw.inject_dl(p2)
    gw.inject_dl(p9)                                      # unrouted: dropped
    assert got == [p2]
    gw.send_ul(b"up")
    assert gw.ul_packets == [b"up"]
    gw.del_route((10, 0, 0, 2))
    gw.inject_dl(p2)
    assert got == [p2]


def _tun_available():
    from lteax.stack.gw import GwTun
    if not GwTun.available():
        return False
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_RAW,
                          socket.IPPROTO_ICMP)
        s.close()
        return True
    except PermissionError:
        return False


@pytest.mark.skipif(not _tun_available(),
                    reason="needs /dev/net/tun + raw-socket privileges")
@pytest.mark.heavy
def test_kernel_ping_through_phy(tmp_path):
    """Kernel ICMP -> TUN -> DRB DL over the OFDM TTI loop -> UE echo ->
    SR/grant -> PUSCH UL -> TUN -> kernel."""
    from lteax.apps.enb_service import EnbService

    svc = EnbService(port=0, cnfg_path=str(tmp_path / "cnfg"),
                     hss_path=str(tmp_path / "hss"))
    try:
        svc.cnfg.set("gw_enable", True)
        svc.cnfg.set("gw_ifname", "lteaxtest0")
        imsi = "001010000000001"
        svc.hss.add_user(imsi, "000102030405060708090a0b0c0d0e0f",
                         "101112131415161718191a1b1c1d1e1f")
        assert "started" in svc._cmd_start([])
        assert svc.gw is not None, "TUN gateway failed to come up"
        assert "attaching" in svc._cmd_add_ue([imsi])
        svc._cmd_step(["12"])                 # completes attach + route
        su = next(iter(svc.ues.values()))
        ue_ip = su.ue.rrc_ue.ip
        assert ue_ip is not None

        sock = socket.socket(socket.AF_INET, socket.SOCK_RAW,
                             socket.IPPROTO_ICMP)
        sock.bind(("10.0.0.1", 0))
        sock.settimeout(0.2)
        sock.sendto(_icmp_echo((10, 0, 0, 1), ue_ip)[20:],
                    (".".join(map(str, ue_ip)), 0))
        reply = None
        for _ in range(40):                   # SR handshake needs TTIs
            svc._cmd_step(["4"])
            try:
                data, addr = sock.recvfrom(2048)
            except socket.timeout:
                continue
            ihl = (data[0] & 0xF) * 4
            if data[ihl] == 0 and addr[0] == ".".join(map(str, ue_ip)):
                reply = data
                break
        sock.close()
        assert reply is not None, "no ICMP echo reply through the PHY"
        assert reply[ihl + 4:ihl + 8] == struct.pack(">HH", 0x1234, 1)
    finally:
        svc.close()
