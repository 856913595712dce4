"""MAC PDU pack/unpack (36.321 §6).

(reference capability: ``liblte/src/liblte_mac.cc ::
liblte_mac_pack_mac_pdu`` / ``liblte_mac_unpack_mac_pdu`` /
``liblte_mac_pack_random_access_response_pdu``.)
"""

from __future__ import annotations

import dataclasses

# LCIDs (DL-SCH)
LCID_CCCH = 0x00
LCID_CONT_RES = 0x1C
LCID_TA_CMD = 0x1D
LCID_PADDING = 0x1F


@dataclasses.dataclass
class MacSubPdu:
    lcid: int
    payload: bytes = b""          # SDU or CE body


def pack_mac_pdu(subpdus: list[MacSubPdu], pad_to: int | None = None) -> bytes:
    """Build a MAC PDU: subheaders then SDUs/CEs, optional padding."""
    ce_sizes = {LCID_CONT_RES: 6, LCID_TA_CMD: 1, LCID_PADDING: 0}
    headers = b""
    bodies = b""
    items = list(subpdus)
    total_fixed = 0
    for i, sp in enumerate(items):
        last = i == len(items) - 1
        e = 0 if last else 1
        if sp.lcid in ce_sizes:
            headers += bytes([(e << 5) | sp.lcid])
            if ce_sizes[sp.lcid]:
                assert len(sp.payload) == ce_sizes[sp.lcid], sp
                bodies += sp.payload
        else:
            l = len(sp.payload)
            if last:
                headers += bytes([(0 << 5) | sp.lcid])
            elif l < 128:
                headers += bytes([(1 << 5) | sp.lcid, l & 0x7F])
            else:
                headers += bytes([(1 << 5) | sp.lcid,
                                  0x80 | ((l >> 8) & 0x7F), l & 0xFF])
            bodies += sp.payload
    pdu = headers + bodies
    if pad_to is not None and len(pdu) < pad_to:
        pad = pad_to - len(pdu)
        if pad == 1:
            pdu = bytes([(0 << 5) | LCID_PADDING]) + pdu   # single pad header first
        else:
            # padding subheader appended as last subheader + zero bytes
            pdu = pdu + bytes([LCID_PADDING] * 1) + bytes(pad - 1)
    return pdu


def unpack_mac_pdu(data: bytes) -> list[MacSubPdu]:
    """Parse subheaders then split bodies."""
    ce_sizes = {LCID_CONT_RES: 6, LCID_TA_CMD: 1}
    hdrs = []
    pos = 0
    while True:
        b0 = data[pos]
        e = (b0 >> 5) & 1
        lcid = b0 & 0x1F
        pos += 1
        if lcid in ce_sizes or lcid == LCID_PADDING:
            hdrs.append((lcid, ce_sizes.get(lcid, 0)))
        elif e == 0:
            hdrs.append((lcid, -1))       # last SDU: takes the remainder
        else:
            f = (data[pos] >> 7) & 1
            if f:
                l = ((data[pos] & 0x7F) << 8) | data[pos + 1]
                pos += 2
            else:
                l = data[pos] & 0x7F
                pos += 1
            hdrs.append((lcid, l))
        if e == 0:
            break
    out = []
    for lcid, l in hdrs:
        if lcid == LCID_PADDING:
            out.append(MacSubPdu(lcid, b""))
            continue
        if l < 0:
            l = len(data) - pos
        out.append(MacSubPdu(lcid, data[pos:pos + l]))
        pos += l
    return out


@dataclasses.dataclass
class Rar:
    rapid: int
    timing_advance: int       # 11 bits
    ul_grant: int             # 20 bits
    tc_rnti: int              # 16 bits


def pack_rar_pdu(rars: list[Rar], backoff: int | None = None) -> bytes:
    """Random Access Response PDU (36.321 §6.1.5/6.2.3)."""
    out = b""
    if backoff is not None:
        e = 1 if rars else 0
        out += bytes([(e << 7) | (0 << 6) | (backoff & 0x0F)])
    for i, r in enumerate(rars):
        e = 0 if i == len(rars) - 1 else 1
        out += bytes([(e << 7) | (1 << 6) | (r.rapid & 0x3F)])
    for r in rars:
        ta, g = r.timing_advance & 0x7FF, r.ul_grant & 0xFFFFF
        out += bytes([
            (ta >> 4) & 0x7F,
            ((ta & 0xF) << 4) | ((g >> 16) & 0xF),
            (g >> 8) & 0xFF,
            g & 0xFF,
            (r.tc_rnti >> 8) & 0xFF,
            r.tc_rnti & 0xFF,
        ])
    return out


def unpack_rar_pdu(data: bytes) -> tuple[int | None, list[Rar]]:
    backoff = None
    rapids = []
    pos = 0
    while True:
        b0 = data[pos]
        e, t = (b0 >> 7) & 1, (b0 >> 6) & 1
        pos += 1
        if t == 0:
            backoff = b0 & 0x0F
        else:
            rapids.append(b0 & 0x3F)
        if e == 0:
            break
    rars = []
    for rapid in rapids:
        b = data[pos:pos + 6]
        ta = (b[0] << 4) | (b[1] >> 4)
        g = ((b[1] & 0xF) << 16) | (b[2] << 8) | b[3]
        rnti = (b[4] << 8) | b[5]
        rars.append(Rar(rapid, ta & 0x7FF, g, rnti))
        pos += 6
    return backoff, rars
