"""Timers, user manager, HSS database (+ ctrl integration)."""

import socket

from lteax.stack.timers import TimerManager
from lteax.stack.users import UserManager, Hss


def test_timer_manager():
    tm = TimerManager()
    fired = []
    t1 = tm.start(5, lambda: fired.append("a"))
    t2 = tm.start(3, lambda: fired.append("b"))
    t3 = tm.start(4, lambda: fired.append("c"))
    assert tm.stop(t3)
    assert not tm.stop(t3)
    assert tm.tick(2) == 0 and fired == []
    assert tm.tick(1) == 1 and fired == ["b"]
    assert tm.running(t1) and not tm.running(t2)
    t1b = tm.restart(t1, 10)
    assert tm.tick(5) == 0            # old expiry cancelled
    assert tm.tick(5) == 1 and fired == ["b", "a"]
    assert not tm.running(t1b)


def test_user_manager():
    um = UserManager()
    u1 = um.add_user("001010000000001")
    u2 = um.add_user("001010000000002")
    assert u1.c_rnti != u2.c_rnti
    assert um.find(u1.c_rnti) is u1
    assert um.find_imsi("001010000000002") is u2
    rb = u1.add_bearer(1, "am")
    u1.add_bearer(5, "um", lcid=3)
    assert u1.bearers[1] is rb and u1.bearers[5].lcid == 3
    assert um.release(u1.c_rnti)
    assert um.find(u1.c_rnti) is None and len(um) == 1


def test_hss_persistence_and_ctrl(tmp_path):
    path = str(tmp_path / "hss.json")
    h = Hss(path)
    h.add_user("001010123456789", "465b5ce8b199b49faa5f0a2ee238a6bc",
               "cd63cb71954a9f4e48a5994e37a02baf")
    k, opc = h.get_user("001010123456789")
    assert len(k) == 16 and len(opc) == 16
    # reload from disk
    h2 = Hss(path)
    assert h2.get_user("001010123456789") == (k, opc)
    # ctrl command surface (reference add_user/del_user/print_users parity)
    from lteax.apps.ctrl import CtrlServer
    srv = CtrlServer({}, h2.ctrl_commands(), port=0)
    try:
        def cmd(line):
            with socket.create_connection(("127.0.0.1", srv.port),
                                          timeout=5) as s:
                s.sendall(line.encode() + b"\n")
                return s.makefile().readline().strip()
        assert "001010123456789" in cmd("print_users")
        assert cmd("add_user 001019999999999 00112233445566778899aabbccddeeff"
                   " 00112233445566778899aabbccddeeff").startswith("ok added")
        assert cmd("del_user 001019999999999") == "ok deleted"
        assert cmd("del_user nope") == "ok unknown imsi"
    finally:
        srv.stop()
    assert h2.get_user("001019999999999") is None


def test_rnti_wrap_allocation():
    um = UserManager()
    um._next = UserManager.C_RNTI_END - 1
    a = um.add_user()
    b = um.add_user()
    c = um.add_user()          # wraps to C_RNTI_START
    assert a.c_rnti == UserManager.C_RNTI_END - 1
    assert b.c_rnti == UserManager.C_RNTI_END
    assert c.c_rnti == UserManager.C_RNTI_START
    # collision path: start again over the same range
    um2 = UserManager()
    u1 = um2.add_user()
    um2._next = u1.c_rnti      # force collision
    u2 = um2.add_user()
    assert u2.c_rnti != u1.c_rnti


def test_cnfg_db(tmp_path):
    import pytest
    from lteax.stack.cnfg_db import CnfgDb
    path = str(tmp_path / "cnfg.json")
    db = (CnfgDb(path)
          .define("dl_earfcn", 300, lo=0, hi=65535)
          .define("bandwidth", 6, choices=(6, 15, 25, 50, 75, 100))
          .define("enable_pcap", False))
    db.set("dl_earfcn", "1950")
    assert db.get("dl_earfcn") == 1950
    with pytest.raises(ValueError):
        db.set("bandwidth", 7)
    db.set("enable_pcap", "on")
    # reload from file
    db2 = (CnfgDb(path)
           .define("dl_earfcn", 300, lo=0, hi=65535)
           .define("bandwidth", 6, choices=(6, 15, 25, 50, 75, 100))
           .define("enable_pcap", False))
    assert db2.get("dl_earfcn") == 1950 and db2.get("enable_pcap") is True
    # ctrl-server wiring: writes go through typing/range checks
    view = db2.as_ctrl_params()
    view["bandwidth"] = "25"
    assert db2.get("bandwidth") == 25
