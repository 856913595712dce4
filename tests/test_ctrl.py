"""Operator ctrl-socket interface (reference command-language parity)."""

import socket

from lteax.apps.ctrl import CtrlServer


def _cmd(port, line):
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        s.sendall(line.encode() + b"\n")
        return s.makefile().readline().strip()


def test_ctrl_read_write_commands():
    params = {"band": 1, "dl_earfcn": 300, "enable_pcap": False}
    scans = []
    srv = CtrlServer(params, {"scan": lambda a: scans.append(a) or "started"},
                     port=0)
    try:
        assert _cmd(srv.port, "read dl_earfcn") == "ok dl_earfcn = 300"
        assert _cmd(srv.port, "write dl_earfcn 1950").startswith("ok")
        assert params["dl_earfcn"] == 1950
        assert _cmd(srv.port, "write enable_pcap on").startswith("ok")
        assert params["enable_pcap"] is True
        assert _cmd(srv.port, "scan 300 301") == "ok started"
        assert scans == [["300", "301"]]
        assert "commands:" in _cmd(srv.port, "help")
        assert _cmd(srv.port, "read nope").startswith("error")
        assert _cmd(srv.port, "bogus").startswith("error")
    finally:
        srv.stop()
