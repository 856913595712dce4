"""NAS EMM/ESM message codec subset (24.301 §8/§9) + security-protected
NAS wrapping.

(reference capability: ``liblte/src/liblte_mme.cc ::
liblte_mme_pack_attach_request_msg`` / ``_unpack_*``, authentication
request/response, security mode command/complete, activate default EPS
bearer, EMM information, and the security-protected NAS header handling.)

Covers the attach/AKA/security-mode flow the reference's builtin MME runs.
IE encodings follow 24.301 layouts for the fields carried; optional IEs not
needed by that flow are omitted (tracked for the citation pass).
"""

from __future__ import annotations

import dataclasses
import struct

from lteax.stack import security as sec

PD_EMM = 0x07
PD_ESM = 0x02

# message types (24.301 table 9.8.1)
MT_ATTACH_REQUEST = 0x41
MT_ATTACH_ACCEPT = 0x42
MT_ATTACH_COMPLETE = 0x43
MT_ATTACH_REJECT = 0x44
MT_AUTH_REQUEST = 0x52
MT_AUTH_RESPONSE = 0x53
MT_AUTH_REJECT = 0x54
MT_IDENTITY_REQUEST = 0x55
MT_IDENTITY_RESPONSE = 0x56
MT_SECURITY_MODE_COMMAND = 0x5D
MT_SECURITY_MODE_COMPLETE = 0x5E
MT_EMM_INFORMATION = 0x61
MT_ACT_DEF_BEARER_REQUEST = 0xC1
MT_ACT_DEF_BEARER_ACCEPT = 0xC2
MT_PDN_CONNECTIVITY_REQUEST = 0xD0

SEC_HDR_PLAIN = 0x0
SEC_HDR_INTEGRITY = 0x1
SEC_HDR_INTEGRITY_CIPHERED = 0x2
SEC_HDR_INTEGRITY_NEW_CTX = 0x3
SEC_HDR_INTEGRITY_CIPHERED_NEW_CTX = 0x4


def _bcd(digits) -> bytes:
    ds = list(digits)
    if len(ds) % 2:
        ds = ds + [0xF]
    return bytes((ds[i + 1] << 4) | ds[i] for i in range(0, len(ds), 2))


def _unbcd(data: bytes) -> list[int]:
    out = []
    for b in data:
        out.append(b & 0xF)
        out.append(b >> 4)
    return [d for d in out if d != 0xF]


# ---------------------------------------------------------------------------
# EMM messages
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AttachRequest:
    imsi: tuple[int, ...]            # digits
    attach_type: int = 1             # EPS attach
    ksi: int = 7                     # no key available
    ue_caps: bytes = b"\xf0\xf0"     # EEA0/EIA0..2-ish bitmap
    esm_container: bytes = b""


def pack_attach_request(m: AttachRequest) -> bytes:
    out = bytes([PD_EMM, MT_ATTACH_REQUEST,
                 (m.ksi << 4) | m.attach_type])
    ident = _bcd(m.imsi)
    # EPS mobile identity: len, odd/even|type(=1 IMSI) in first nibble
    odd = len(m.imsi) % 2
    first = (m.imsi[0] << 4) | (odd << 3) | 0x1
    body = bytes([first]) + _bcd(m.imsi[1:])
    out += bytes([len(body)]) + body
    out += bytes([len(m.ue_caps)]) + m.ue_caps
    out += struct.pack(">H", len(m.esm_container)) + m.esm_container
    return out


def unpack_attach_request(data: bytes) -> AttachRequest | None:
    if data[0] != PD_EMM or data[1] != MT_ATTACH_REQUEST:
        return None
    ksi = data[2] >> 4
    at = data[2] & 0xF
    pos = 3
    ilen = data[pos]
    pos += 1
    first = data[pos]
    digits = [first >> 4] + _unbcd(data[pos + 1: pos + ilen])
    pos += ilen
    clen = data[pos]
    pos += 1
    caps = data[pos:pos + clen]
    pos += clen
    elen = struct.unpack(">H", data[pos:pos + 2])[0]
    pos += 2
    esm = data[pos:pos + elen]
    return AttachRequest(imsi=tuple(digits), attach_type=at, ksi=ksi,
                         ue_caps=caps, esm_container=esm)


@dataclasses.dataclass
class AuthRequest:
    ksi: int
    rand: bytes          # 16
    autn: bytes          # 16


def pack_auth_request(m: AuthRequest) -> bytes:
    return bytes([PD_EMM, MT_AUTH_REQUEST, m.ksi & 0xF]) + m.rand \
        + bytes([len(m.autn)]) + m.autn


def unpack_auth_request(data: bytes) -> AuthRequest | None:
    if data[0] != PD_EMM or data[1] != MT_AUTH_REQUEST:
        return None
    ksi = data[2] & 0xF
    rand = data[3:19]
    alen = data[19]
    return AuthRequest(ksi=ksi, rand=rand, autn=data[20:20 + alen])


@dataclasses.dataclass
class AuthResponse:
    res: bytes


def pack_auth_response(m: AuthResponse) -> bytes:
    return bytes([PD_EMM, MT_AUTH_RESPONSE, len(m.res)]) + m.res


def unpack_auth_response(data: bytes) -> AuthResponse | None:
    if data[0] != PD_EMM or data[1] != MT_AUTH_RESPONSE:
        return None
    return AuthResponse(res=data[3:3 + data[2]])


@dataclasses.dataclass
class SecurityModeCommand:
    ciphering_alg: int   # 0=EEA0, 1=EEA1, 2=EEA2
    integrity_alg: int   # 1=EIA1, 2=EIA2
    ksi: int
    replayed_ue_caps: bytes = b"\xf0\xf0"


def pack_security_mode_command(m: SecurityModeCommand) -> bytes:
    return bytes([PD_EMM, MT_SECURITY_MODE_COMMAND,
                  (m.ciphering_alg << 4) | m.integrity_alg, m.ksi & 0xF,
                  len(m.replayed_ue_caps)]) + m.replayed_ue_caps


def unpack_security_mode_command(data: bytes) -> SecurityModeCommand | None:
    if data[0] != PD_EMM or data[1] != MT_SECURITY_MODE_COMMAND:
        return None
    return SecurityModeCommand(
        ciphering_alg=data[2] >> 4, integrity_alg=data[2] & 0xF,
        ksi=data[3] & 0xF, replayed_ue_caps=data[5:5 + data[4]])


def pack_security_mode_complete() -> bytes:
    return bytes([PD_EMM, MT_SECURITY_MODE_COMPLETE])


def unpack_security_mode_complete(data: bytes) -> bool:
    return len(data) >= 2 and data[0] == PD_EMM and \
        data[1] == MT_SECURITY_MODE_COMPLETE


@dataclasses.dataclass
class AttachComplete:
    esm_container: bytes = b""


def pack_attach_complete(m: AttachComplete) -> bytes:
    return bytes([PD_EMM, MT_ATTACH_COMPLETE]) + \
        struct.pack(">H", len(m.esm_container)) + m.esm_container


def unpack_attach_complete(data: bytes) -> AttachComplete | None:
    if data[0] != PD_EMM or data[1] != MT_ATTACH_COMPLETE:
        return None
    elen = struct.unpack(">H", data[2:4])[0]
    return AttachComplete(esm_container=data[4:4 + elen])


@dataclasses.dataclass
class AttachAccept:
    attach_result: int
    t3412_s: int
    tac: int
    mcc: tuple[int, int, int]
    mnc: tuple[int, ...]
    esm_container: bytes = b""


def pack_attach_accept(m: AttachAccept) -> bytes:
    plmn = _bcd([*m.mcc, *m.mnc])
    out = bytes([PD_EMM, MT_ATTACH_ACCEPT, m.attach_result & 0xF,
                 min(m.t3412_s // 60, 31) | 0x20])   # GPRS timer, minutes
    out += bytes([6]) + plmn.ljust(3, b"\xff") + struct.pack(">H", m.tac) \
        + bytes([0])
    out += struct.pack(">H", len(m.esm_container)) + m.esm_container
    return out


def unpack_attach_accept(data: bytes) -> AttachAccept | None:
    if data[0] != PD_EMM or data[1] != MT_ATTACH_ACCEPT:
        return None
    result = data[2] & 0xF
    t3412 = (data[3] & 0x1F) * 60
    pos = 4
    tlen = data[pos]
    pos += 1
    plmn = _unbcd(data[pos:pos + 3])
    tac = struct.unpack(">H", data[pos + 3:pos + 5])[0]
    pos += tlen
    elen = struct.unpack(">H", data[pos:pos + 2])[0]
    pos += 2
    return AttachAccept(attach_result=result, t3412_s=t3412, tac=tac,
                        mcc=tuple(plmn[:3]), mnc=tuple(plmn[3:]),
                        esm_container=data[pos:pos + elen])


MT_DETACH_REQUEST = 0x45
MT_DETACH_ACCEPT = 0x46
MT_TAU_REQUEST = 0x48
MT_TAU_ACCEPT = 0x49
MT_SERVICE_REQUEST_HDR = 0xC  # security header type for SERVICE REQUEST


@dataclasses.dataclass
class DetachRequest:
    detach_type: int = 1       # EPS detach
    switch_off: bool = False
    ksi: int = 0


def pack_detach_request(m: DetachRequest) -> bytes:
    dt = (m.detach_type & 0x7) | (0x8 if m.switch_off else 0)
    return bytes([PD_EMM, MT_DETACH_REQUEST, (m.ksi << 4) | dt])


def unpack_detach_request(data: bytes) -> DetachRequest | None:
    if data[0] != PD_EMM or data[1] != MT_DETACH_REQUEST:
        return None
    return DetachRequest(detach_type=data[2] & 0x7,
                         switch_off=bool(data[2] & 0x8), ksi=data[2] >> 4)


def pack_detach_accept() -> bytes:
    return bytes([PD_EMM, MT_DETACH_ACCEPT])


@dataclasses.dataclass
class TauRequest:
    update_type: int = 0       # TA updating
    ksi: int = 0
    old_guti: int = 0          # 32-bit M-TMSI subset


def pack_tau_request(m: TauRequest) -> bytes:
    return bytes([PD_EMM, MT_TAU_REQUEST,
                  (m.ksi << 4) | (m.update_type & 0xF)]) \
        + struct.pack(">I", m.old_guti)


def unpack_tau_request(data: bytes) -> TauRequest | None:
    if data[0] != PD_EMM or data[1] != MT_TAU_REQUEST:
        return None
    return TauRequest(update_type=data[2] & 0xF, ksi=data[2] >> 4,
                      old_guti=struct.unpack(">I", data[3:7])[0])


@dataclasses.dataclass
class TauAccept:
    update_result: int = 0
    t3412_s: int = 3600
    tac: int = 0
    mcc: tuple[int, int, int] = (0, 0, 1)
    mnc: tuple[int, ...] = (0, 1)


def pack_tau_accept(m: TauAccept) -> bytes:
    plmn = _bcd([*m.mcc, *m.mnc])
    return bytes([PD_EMM, MT_TAU_ACCEPT, m.update_result & 0xF,
                  min(m.t3412_s // 60, 31) | 0x20, 6]) \
        + plmn.ljust(3, b"\xff") + struct.pack(">H", m.tac) + bytes([0])


def unpack_tau_accept(data: bytes) -> TauAccept | None:
    if data[0] != PD_EMM or data[1] != MT_TAU_ACCEPT:
        return None
    plmn = _unbcd(data[5:8])
    tac = struct.unpack(">H", data[8:10])[0]
    return TauAccept(update_result=data[2] & 0xF,
                     t3412_s=(data[3] & 0x1F) * 60, tac=tac,
                     mcc=tuple(plmn[:3]), mnc=tuple(plmn[3:]))


@dataclasses.dataclass
class ServiceRequest:
    """SERVICE REQUEST (24.301 §8.2.25): 2-byte compact format with its own
    security header type, short MAC."""
    ksi: int = 0
    seq: int = 0
    short_mac: int = 0


def pack_service_request(m: ServiceRequest) -> bytes:
    return bytes([(MT_SERVICE_REQUEST_HDR << 4) | PD_EMM,
                  (m.ksi << 5) | (m.seq & 0x1F)]) \
        + struct.pack(">H", m.short_mac)


def unpack_service_request(data: bytes) -> ServiceRequest | None:
    if (data[0] >> 4) != MT_SERVICE_REQUEST_HDR or (data[0] & 0xF) != PD_EMM:
        return None
    return ServiceRequest(ksi=data[1] >> 5, seq=data[1] & 0x1F,
                          short_mac=struct.unpack(">H", data[2:4])[0])


@dataclasses.dataclass
class EmmInformation:
    network_name: str = ""


def pack_emm_information(m: EmmInformation) -> bytes:
    name = m.network_name.encode()
    return bytes([PD_EMM, MT_EMM_INFORMATION, 0x43, len(name) + 1, 0x80]) \
        + name


def unpack_emm_information(data: bytes) -> EmmInformation | None:
    if data[0] != PD_EMM or data[1] != MT_EMM_INFORMATION:
        return None
    if len(data) > 4 and data[2] == 0x43:
        ln = data[3]
        return EmmInformation(network_name=data[5:4 + ln].decode(
            errors="replace"))
    return EmmInformation()


# ---------------------------------------------------------------------------
# ESM messages (minimal)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PdnConnectivityRequest:
    ebi: int = 0
    pti: int = 1
    pdn_type: int = 1    # IPv4


def pack_pdn_connectivity_request(m: PdnConnectivityRequest) -> bytes:
    return bytes([(m.ebi << 4) | PD_ESM, m.pti, MT_PDN_CONNECTIVITY_REQUEST,
                  (m.pdn_type << 4) | 0x1])


@dataclasses.dataclass
class ActivateDefaultBearerRequest:
    ebi: int
    pti: int
    apn: str
    ip: tuple[int, int, int, int]


def pack_activate_default_bearer_request(m: ActivateDefaultBearerRequest) -> bytes:
    apn_b = m.apn.encode()
    return bytes([(m.ebi << 4) | PD_ESM, m.pti, MT_ACT_DEF_BEARER_REQUEST,
                  len(apn_b)]) + apn_b + bytes([5, 1, *m.ip])


def unpack_activate_default_bearer_request(data: bytes):
    if (data[0] & 0xF) != PD_ESM or data[2] != MT_ACT_DEF_BEARER_REQUEST:
        return None
    ebi, pti = data[0] >> 4, data[1]
    alen = data[3]
    apn = data[4:4 + alen].decode()
    pos = 4 + alen
    ip = tuple(data[pos + 2:pos + 6])
    return ActivateDefaultBearerRequest(ebi=ebi, pti=pti, apn=apn, ip=ip)


@dataclasses.dataclass
class ActivateDefaultBearerAccept:
    ebi: int
    pti: int = 0


def pack_activate_default_bearer_accept(m: ActivateDefaultBearerAccept
                                        ) -> bytes:
    return bytes([(m.ebi << 4) | PD_ESM, m.pti, MT_ACT_DEF_BEARER_ACCEPT])


def unpack_activate_default_bearer_accept(data: bytes
                                          ) -> ActivateDefaultBearerAccept | None:
    if (data[0] & 0xF) != PD_ESM or data[2] != MT_ACT_DEF_BEARER_ACCEPT:
        return None
    return ActivateDefaultBearerAccept(ebi=data[0] >> 4, pti=data[1])


# ---------------------------------------------------------------------------
# Security-protected NAS (24.301 §9.1/9.5)
# ---------------------------------------------------------------------------

def protect(plain: bytes, k_nas_int: bytes, count: int, downlink: bool,
            k_nas_enc: bytes | None = None,
            sec_hdr: int = SEC_HDR_INTEGRITY) -> bytes:
    """Wrap a plain NAS message with SEQ + MAC (EIA2), optional EEA2."""
    direction = 1 if downlink else 0
    seq = count & 0xFF
    body = plain
    if sec_hdr in (SEC_HDR_INTEGRITY_CIPHERED,
                   SEC_HDR_INTEGRITY_CIPHERED_NEW_CTX):
        assert k_nas_enc is not None
        body = sec.eea2(k_nas_enc, count, 0, direction, plain)
    mac = sec.eia2(k_nas_int, count, 0, direction, bytes([seq]) + body)
    return bytes([(sec_hdr << 4) | PD_EMM]) + mac + bytes([seq]) + body


def unprotect(data: bytes, k_nas_int: bytes, count_hint: int,
              downlink: bool, k_nas_enc: bytes | None = None
              ) -> tuple[bytes, bool] | None:
    """-> (plain message, mac_ok).  ``count_hint`` supplies the upper bits
    of the NAS COUNT (low byte comes from the SEQ field)."""
    sec_hdr = data[0] >> 4
    if (data[0] & 0xF) != PD_EMM or sec_hdr == SEC_HDR_PLAIN:
        return None
    mac, seq, body = data[1:5], data[5], data[6:]
    count = (count_hint & ~0xFF) | seq
    direction = 1 if downlink else 0
    calc = sec.eia2(k_nas_int, count, 0, direction, bytes([seq]) + body)
    ok = calc == mac
    if sec_hdr in (SEC_HDR_INTEGRITY_CIPHERED,
                   SEC_HDR_INTEGRITY_CIPHERED_NEW_CTX) and k_nas_enc:
        body = sec.eea2(k_nas_enc, count, 0, direction, body)
    return body, ok
