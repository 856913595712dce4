"""eNodeB service: ctrl-socket operator surface + TTI engine + IQ out."""

import socket

from lteax.apps.enb_service import EnbService
import pytest

IMSI = "001011234567890"
K_HEX = "465b5ce8b199b49faa5f0a2ee238a6bc"
OPC_HEX = "cd63cb71954a9f4e48a5994e37a02baf"


def _cmd(port, line):
    # generous timeout: TTI steps compile JAX graphs on first use
    with socket.create_connection(("127.0.0.1", port), timeout=600) as s:
        s.sendall(line.encode() + b"\n")
        return s.makefile().readline().strip()


@pytest.mark.heavy
def test_enb_service_attach_ping_detach(tmp_path):
    svc = EnbService(port=0)
    try:
        p = svc.port
        assert _cmd(p, f"add_user {IMSI} {K_HEX} {OPC_HEX}").startswith("ok")
        assert _cmd(p, "write n_id_cell 77").startswith("ok")
        assert _cmd(p, "read bandwidth") == "ok bandwidth = 6"
        assert _cmd(p, "start").startswith("ok started")
        r = _cmd(p, f"add_ue {IMSI}")
        assert "attaching" in r
        assert _cmd(p, "step 40").startswith("ok tti=")
        st = _cmd(p, "status")
        assert "state=connected" in st and "ip=10.0.0.2" in st

        assert _cmd(p, f"ping {IMSI}") == "ok queued"
        _cmd(p, "step 10")
        assert "rx=1" in _cmd(p, "status")

        assert "detaching" in _cmd(p, f"detach_ue {IMSI}")
        _cmd(p, "step 20")
        assert "state=idle" in _cmd(p, "status")

        # unknown UE / bad inputs answer cleanly
        assert _cmd(p, "ping 999") .startswith("ok error")
        assert _cmd(p, "add_ue 999999999999999").startswith("ok error")
    finally:
        svc.close()


@pytest.mark.heavy
def test_enb_service_iq_out_decoded_by_scanner(tmp_path):
    """The service's no-RF waveform is a valid LTE DL signal: file_scan
    recovers the cell ID, MIB and SIB1 from the emitted IQ."""
    import numpy as np
    from lteax.apps.file_scan import scan
    from lteax.phy.config import PhyConfig

    iq = tmp_path / "enb.iq"
    svc = EnbService(port=0)
    try:
        p = svc.port
        assert _cmd(p, "write n_id_cell 133").startswith("ok")
        assert _cmd(p, f"write iq_out {iq}").startswith("ok")
        assert _cmd(p, "start").startswith("ok started")
        _cmd(p, "step 45")
    finally:
        svc.close()
    x = np.fromfile(iq, np.float32).view(np.complex64)
    assert len(x) >= 40 * PhyConfig(n_rb_dl=6).n_samps_subframe
    res = scan(x, PhyConfig(n_rb_dl=6))
    assert res.n_cell_id == 133
    assert res.mib is not None and res.mib.n_rb_dl == 6
    assert res.sib1 is not None and res.sib1.tac == 0x1234
