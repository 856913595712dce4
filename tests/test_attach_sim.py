"""End-to-end attach procedure over the real PHY (integration of PRACH,
PDSCH, PUSCH, MAC/RLC/PDCP, NAS, Milenage/EIA2/EEA2)."""

from lteax.apps.attach_sim import run
import pytest


@pytest.mark.heavy
def test_attach_complete(tmp_path):
    res = run(verbose=False, pcap_path=str(tmp_path / "attach.pcap"))
    assert res == {"prach": True, "rar": True, "rrc_request": True,
                   "attach_request": True, "aka": True, "smc": True,
                   "bearer": True}
