"""Full RRC + NAS attach over the simulated air interface.

(reference capability: the end-to-end bring-up the reference demonstrates
against commercial phones — ``LTE_fdd_enb_rrc`` connection setup, AKA via
``LTE_fdd_enb_mme``/``_hss``, NAS+AS security activation, and default
bearer reconfiguration — here with BOTH protocol endpoints (EnbRrc/UeRrc
state machines) exchanging real UPER-coded RRC messages that ride actual
PHY transport blocks: CCCH in MAC PDUs, DCCH in RLC-AM + PDCP SRB frames
(EIA2 MAC-I once AS security activates), over PUSCH/PDSCH with AWGN.)

Run:  python -m lteax.apps.rrc_attach_sim
"""

from __future__ import annotations

import os
import sys

import numpy as np

from lteax.apps.attach_sim import _dl_sch, _ul_sch
from lteax.phy.channels import prach
from lteax.stack import mac_pdu, pdcp_pdu, rlc_pdu, security
from lteax.stack.rrc_proc import EnbRrc, UeRrc
from lteax.stack.users import Hss, UserManager

C_RNTI = 0x003D
RA_RNTI = 0x0002
LCID_DCCH = 0x01
# 6-PRB QPSK transport block (as attach_sim): 864 REs -> 1728 coded bits;
# the largest attach message (reconfiguration + protected NAS) is ~90 bytes
DCCH_TBS = 1032


class _SrbLink:
    """One direction of SRB1: PDCP SRB framing (5-bit SN + MAC-I) inside a
    single RLC AM PDU, integrity-protected with EIA2 once keys arrive."""

    def __init__(self, downlink: bool):
        self.downlink = downlink
        self.sn_tx = 0
        self.k_int: bytes | None = None

    def frame(self, sdu: bytes) -> bytes:
        sn = self.sn_tx & 0x1F
        mac_i = b"\x00\x00\x00\x00"
        if self.k_int is not None:
            mac_i = security.eia2(self.k_int, sn, 0,
                                  1 if self.downlink else 0,
                                  bytes([sn]) + sdu)
        pdu = pdcp_pdu.pack_srb(pdcp_pdu.PdcpSrbPdu(sn=sn, data=sdu,
                                                    mac_i=mac_i))
        self.sn_tx += 1
        return rlc_pdu.pack_amd(rlc_pdu.AmdPdu(sn=sn, data=pdu))

    def deframe(self, raw: bytes) -> bytes:
        amd = rlc_pdu.unpack_amd(raw)
        srb = pdcp_pdu.unpack_srb(amd.data)
        if self.k_int is not None:
            want = security.eia2(self.k_int, srb.sn, 0,
                                 1 if self.downlink else 0,
                                 bytes([srb.sn]) + srb.data)
            if want != srb.mac_i:
                raise ValueError("PDCP SRB integrity check failed")
        return srb.data


def run(verbose: bool = True, noise_db: float = 12.0,
        seed: int = 42) -> dict:
    log = (lambda *a: print(*a, file=sys.stderr)) if verbose \
        else (lambda *a: None)
    rng = np.random.default_rng(seed)
    cid = 214
    noise = 10 ** (-noise_db / 10)
    result = {}

    imsi = (0, 0, 1, 0, 1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0)
    k = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
    opc = bytes.fromhex("cd63cb71954a9f4e48a5994e37a02baf")
    hss = Hss()
    hss.add_user("".join(map(str, imsi)), k.hex(), opc.hex())
    enb = EnbRrc(hss, UserManager(), seed=seed)
    ue = UeRrc(imsi, k, opc)
    dl_srb, ul_srb = _SrbLink(downlink=True), _SrbLink(downlink=False)

    # 1. PRACH -> RAR (MAC, as in attach_sim)
    u_root, ncs, rapid = 129, 119, 3
    burst = prach.generate_prach(u_root, rapid, ncs)
    rx = burst + (rng.standard_normal(len(burst))
                  + 1j * rng.standard_normal(len(burst))) * np.sqrt(noise / 2)
    ncp = prach.PRACH_FORMATS[0][0]
    dets = prach.detect_prach(rx[ncp:].astype(np.complex64), u_root, ncs)
    assert dets and max(dets, key=lambda t: t[2])[0] == rapid
    rar = mac_pdu.pack_rar_pdu([mac_pdu.Rar(rapid=rapid, timing_advance=2,
                                            ul_grant=0x123, tc_rnti=C_RNTI)])
    got = _dl_sch(rar, 256, RA_RNTI, 1, cid, noise, rng)
    assert got is not None
    _, rars = mac_pdu.unpack_rar_pdu(got)
    assert rars[0].tc_rnti == C_RNTI
    log(f"[1] PRACH + RAR: TC-RNTI=0x{C_RNTI:04X}")
    result["rach"] = True

    # 2..N: pump the RRC engines; every message crosses the PHY
    sf = [2]

    def _next_sf() -> int:
        s = sf[0]
        sf[0] = (sf[0] + 1) % 10
        return s

    def _ul(chan: str, raw: bytes) -> list[tuple[str, bytes]]:
        """UE -> eNB over PUSCH."""
        if chan == "ccch":
            pdu = mac_pdu.pack_mac_pdu(
                [mac_pdu.MacSubPdu(mac_pdu.LCID_CCCH, raw)])
        else:
            pdu = mac_pdu.pack_mac_pdu(
                [mac_pdu.MacSubPdu(LCID_DCCH, ul_srb.frame(raw))])
        got = _ul_sch(pdu, DCCH_TBS, C_RNTI, _next_sf(), cid, noise, rng)
        assert got is not None, "PUSCH decode failed"
        sub = mac_pdu.unpack_mac_pdu(got)[0]
        if sub.lcid == mac_pdu.LCID_CCCH:
            return enb.on_ul_ccch(C_RNTI, sub.payload)
        return enb.on_ul_dcch(C_RNTI, ul_srb.deframe(sub.payload))

    def _dl(chan: str, raw: bytes) -> list[tuple[str, bytes]]:
        """eNB -> UE over PDSCH."""
        if chan == "ccch":
            pdu = mac_pdu.pack_mac_pdu(
                [mac_pdu.MacSubPdu(mac_pdu.LCID_CCCH, raw)])
        else:
            pdu = mac_pdu.pack_mac_pdu(
                [mac_pdu.MacSubPdu(LCID_DCCH, dl_srb.frame(raw))])
        got = _dl_sch(pdu, DCCH_TBS, C_RNTI, _next_sf(), cid, noise, rng)
        assert got is not None, "PDSCH decode failed"
        sub = mac_pdu.unpack_mac_pdu(got)[0]
        if sub.lcid == mac_pdu.LCID_CCCH:
            return ue.on_dl_ccch(sub.payload)
        return ue.on_dl_dcch(dl_srb.deframe(sub.payload))

    dl_queue = _ul("ccch", ue.connect())
    n_msgs = 1
    while dl_queue:
        chan, raw = dl_queue.pop(0)
        replies = _dl(chan, raw)
        n_msgs += 1
        # AS security activation point: SMC was just delivered to the UE
        if ue.k_enb and ul_srb.k_int is None:
            _, k_rrc_int, _ = security.generate_as_keys(ue.k_enb)
            ul_srb.k_int = dl_srb.k_int = k_rrc_int
            log("[*] AS security activated: SRB1 EIA2 MAC-I on")
            result["as_security"] = True
        for chan2, up in replies:
            dl_queue.extend(_ul(chan2, up))
            n_msgs += 1
        assert n_msgs < 50

    p = enb.proc(C_RNTI)
    assert ue.state == "connected" and p.state == "attach-done"
    assert ue.k_enb == p.k_enb and ue.ip == p.ip
    log(f"[2] RRC attach complete over the PHY: {n_msgs} messages, "
        f"IP={'.'.join(map(str, ue.ip))}")
    log("    eNB events: " + "; ".join(enb.events))
    log("    UE events:  " + "; ".join(ue.events))
    result["attach"] = True

    # 3. user plane on the new DRB: EEA2-ciphered IP packet UL
    _, _, k_up_enc = security.generate_as_keys(ue.k_enb)
    ip_packet = b"\x45\x00" + bytes(18) + b"ping"
    ciphered = security.eea2(k_up_enc, 0, ue.drb.eps_bearer_identity - 1, 0,
                             ip_packet)
    drb = pdcp_pdu.pack_drb(pdcp_pdu.PdcpDrbPdu(sn=0, data=ciphered))
    got = _ul_sch(drb, 504, C_RNTI, _next_sf(), cid, noise, rng)
    drb_rx = pdcp_pdu.unpack_drb(got[:len(drb)])
    _, _, k_up_e = security.generate_as_keys(p.k_enb)
    assert security.eea2(k_up_e, 0, p.drb.eps_bearer_identity - 1, 0,
                         drb_rx.data) == ip_packet
    log("[3] Ciphered user-plane packet delivered on DRB1")
    result["user_plane"] = True
    return result


def main():
    from lteax.utils.platform import apply_platform_env
    apply_platform_env()
    res = run(verbose=True)
    print({"rrc_attach_complete": all(res.values()), **res})


if __name__ == "__main__":
    main()
