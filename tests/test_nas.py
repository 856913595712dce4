"""NAS EMM/ESM codec + security-protected wrapping + full AKA flow."""

import numpy as np

from lteax.stack import nas, security


def test_attach_request_roundtrip():
    esm = nas.pack_pdn_connectivity_request(nas.PdnConnectivityRequest())
    m = nas.AttachRequest(imsi=(0, 0, 1, 0, 1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0),
                          esm_container=esm)
    back = nas.unpack_attach_request(nas.pack_attach_request(m))
    assert back is not None
    assert back.imsi == m.imsi
    assert back.esm_container == esm


def test_auth_roundtrip():
    a = nas.AuthRequest(ksi=2, rand=bytes(range(16)), autn=bytes(range(16, 32)))
    b = nas.unpack_auth_request(nas.pack_auth_request(a))
    assert b == a
    r = nas.AuthResponse(res=b"\x01" * 8)
    assert nas.unpack_auth_response(nas.pack_auth_response(r)) == r


def test_smc_and_accept_roundtrip():
    s = nas.SecurityModeCommand(ciphering_alg=2, integrity_alg=2, ksi=1)
    assert nas.unpack_security_mode_command(
        nas.pack_security_mode_command(s)) == s
    esm = nas.pack_activate_default_bearer_request(
        nas.ActivateDefaultBearerRequest(ebi=5, pti=1, apn="internet",
                                         ip=(10, 0, 0, 2)))
    a = nas.AttachAccept(attach_result=1, t3412_s=3600, tac=0x1234,
                         mcc=(0, 0, 1), mnc=(0, 1), esm_container=esm)
    back = nas.unpack_attach_accept(nas.pack_attach_accept(a))
    assert back is not None and back.tac == 0x1234
    bearer = nas.unpack_activate_default_bearer_request(back.esm_container)
    assert bearer.apn == "internet" and bearer.ip == (10, 0, 0, 2)


def test_protected_nas_roundtrip():
    k_int = bytes(range(16))
    k_enc = bytes(range(16, 32))
    plain = nas.pack_auth_response(nas.AuthResponse(res=b"\x55" * 8))
    for hdr in (nas.SEC_HDR_INTEGRITY, nas.SEC_HDR_INTEGRITY_CIPHERED):
        wire = nas.protect(plain, k_int, count=5, downlink=False,
                           k_nas_enc=k_enc, sec_hdr=hdr)
        got, ok = nas.unprotect(wire, k_int, count_hint=5, downlink=False,
                                k_nas_enc=k_enc)
        assert ok and got == plain
    # tampering breaks the MAC
    wire = bytearray(nas.protect(plain, k_int, 5, False))
    wire[-1] ^= 1
    _, ok = nas.unprotect(bytes(wire), k_int, 5, False)
    assert not ok


def test_full_aka_flow():
    """End-to-end AKA: HSS Milenage -> AUTN/RAND -> UE RES -> K_ASME ->
    NAS keys -> protected NAS exchange (the reference MME/HSS flow)."""
    k = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
    opc = bytes.fromhex("cd63cb71954a9f4e48a5994e37a02baf")
    rand = bytes.fromhex("23553cbe9637a89d218ae64dae47bf35")
    sqn = bytes.fromhex("000000000001")
    amf = bytes.fromhex("8000")
    # network side
    res_n, ck, ik, ak = security.milenage_f2345(k, rand, op_c=opc)
    mac_a, _ = security.milenage_f1(k, rand, sqn, amf, op_c=opc)
    sqn_xor_ak = bytes(a ^ b for a, b in zip(sqn, ak))
    autn = sqn_xor_ak + amf + mac_a
    # UE side recomputes and must match
    res_u, ck_u, ik_u, ak_u = security.milenage_f2345(k, rand, op_c=opc)
    assert res_u == res_n and ck_u == ck and ik_u == ik
    sqn_u = bytes(a ^ b for a, b in zip(autn[:6], ak_u))
    mac_u, _ = security.milenage_f1(k, rand, sqn_u, autn[6:8], op_c=opc)
    assert mac_u == autn[8:]
    # key hierarchy + protected message exchange
    k_asme = security.generate_k_asme(ck, ik, sqn_xor_ak, b"\x00\xf1\x10")
    k_enc, k_int = security.generate_nas_keys(k_asme)
    msg = nas.pack_security_mode_command(
        nas.SecurityModeCommand(2, 2, ksi=0))
    wire = nas.protect(msg, k_int, count=0, downlink=True, k_nas_enc=k_enc,
                       sec_hdr=nas.SEC_HDR_INTEGRITY_CIPHERED_NEW_CTX)
    got, ok = nas.unprotect(wire, k_int, 0, True, k_nas_enc=k_enc)
    assert ok and nas.unpack_security_mode_command(got) is not None


def test_detach_tau_service_emm_info():
    d = nas.DetachRequest(detach_type=1, switch_off=True, ksi=3)
    assert nas.unpack_detach_request(nas.pack_detach_request(d)) == d
    assert nas.pack_detach_accept()[1] == nas.MT_DETACH_ACCEPT
    t = nas.TauRequest(update_type=1, ksi=2, old_guti=0xCAFEBABE)
    assert nas.unpack_tau_request(nas.pack_tau_request(t)) == t
    ta = nas.TauAccept(update_result=0, t3412_s=1800, tac=0x77AA,
                       mcc=(3, 1, 0), mnc=(4, 1, 0))
    back = nas.unpack_tau_accept(nas.pack_tau_accept(ta))
    assert back.tac == 0x77AA and back.mcc == (3, 1, 0)
    sr = nas.ServiceRequest(ksi=1, seq=17, short_mac=0xBEEF)
    assert nas.unpack_service_request(nas.pack_service_request(sr)) == sr
    ei = nas.EmmInformation(network_name="lteax")
    assert nas.unpack_emm_information(nas.pack_emm_information(ei)) == ei
    # service request is distinguishable from plain EMM
    assert nas.unpack_detach_request(nas.pack_service_request(sr)) is None


def test_identity_and_auth_failure_roundtrips():
    req = nas.IdentityRequest(id_type=nas.ID_TYPE_IMSI)
    assert nas.unpack_identity_request(nas.pack_identity_request(req)) == req
    imsi = (0, 0, 1, 0, 1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0)
    resp = nas.IdentityResponse(id_type=nas.ID_TYPE_IMSI, digits=imsi)
    back = nas.unpack_identity_response(nas.pack_identity_response(resp))
    assert back.digits == imsi and back.id_type == nas.ID_TYPE_IMSI
    # even-digit identity (TMSI-style 8 digits)
    resp8 = nas.IdentityResponse(id_type=nas.ID_TYPE_IMEI,
                                 digits=tuple(range(8)))
    assert nas.unpack_identity_response(
        nas.pack_identity_response(resp8)).digits == tuple(range(8))
    af = nas.AuthFailure(cause=nas.EMM_CAUSE_SYNCH_FAILURE,
                         auts=bytes(range(14)))
    got = nas.unpack_auth_failure(nas.pack_auth_failure(af))
    assert got == af
    plain = nas.AuthFailure(cause=nas.EMM_CAUSE_MAC_FAILURE)
    assert nas.unpack_auth_failure(nas.pack_auth_failure(plain)) == plain
    assert nas.unpack_auth_reject(nas.pack_auth_reject())


def test_reject_and_status_messages():
    cause, esm = nas.EMM_CAUSE_PLMN_NOT_ALLOWED, b"\x02\x01\xd1\x1b"
    got = nas.unpack_attach_reject(nas.pack_attach_reject(cause, esm))
    assert got == (cause, esm)
    assert nas.unpack_attach_reject(nas.pack_attach_reject(cause)) == \
        (cause, b"")
    assert nas.unpack_service_reject(
        nas.pack_service_reject(nas.EMM_CAUSE_CONGESTION)) == \
        nas.EMM_CAUSE_CONGESTION
    assert nas.unpack_tau_reject(
        nas.pack_tau_reject(nas.EMM_CAUSE_TA_NOT_ALLOWED)) == \
        nas.EMM_CAUSE_TA_NOT_ALLOWED
    assert nas.unpack_tau_complete(nas.pack_tau_complete())
    assert nas.unpack_emm_status(
        nas.pack_emm_status(nas.EMM_CAUSE_PROTOCOL_ERROR)) == \
        nas.EMM_CAUSE_PROTOCOL_ERROR


def test_guti_reallocation_roundtrip():
    g = nas.Guti(mcc=(3, 1, 0), mnc=(4, 1, 0), mme_group_id=0x8001,
                 mme_code=0x42, m_tmsi=0xC0FFEE01)
    back = nas.unpack_guti_realloc_command(nas.pack_guti_realloc_command(g))
    assert back == g
    g2 = nas.Guti(mnc=(0, 1))                    # 2-digit MNC
    assert nas.unpack_guti_realloc_command(
        nas.pack_guti_realloc_command(g2)) == g2
    assert nas.unpack_guti_realloc_complete(nas.pack_guti_realloc_complete())


def test_esm_information_and_deactivation():
    assert nas.unpack_esm_information_request(
        nas.pack_esm_information_request(pti=9)) == 9
    pti, apn = nas.unpack_esm_information_response(
        nas.pack_esm_information_response(9, apn="internet.mnc001.example"))
    assert (pti, apn) == (9, "internet.mnc001.example")
    assert nas.unpack_esm_information_response(
        nas.pack_esm_information_response(3)) == (3, "")
    assert nas.unpack_pdn_connectivity_reject(
        nas.pack_pdn_connectivity_reject(5, nas.ESM_CAUSE_UNKNOWN_APN)) == \
        (5, nas.ESM_CAUSE_UNKNOWN_APN)
    assert nas.unpack_deactivate_bearer_request(
        nas.pack_deactivate_bearer_request(5, 2)) == \
        (5, 2, nas.ESM_CAUSE_REGULAR_DEACTIVATION)
    assert nas.unpack_deactivate_bearer_accept(
        nas.pack_deactivate_bearer_accept(5)) == 5
    assert nas.unpack_pdn_disconnect_request(
        nas.pack_pdn_disconnect_request(7, 5)) == (7, 5)
    assert nas.unpack_esm_status(
        nas.pack_esm_status(5, 7, nas.ESM_CAUSE_PROTOCOL_ERROR)) == \
        (5, 7, nas.ESM_CAUSE_PROTOCOL_ERROR)


def test_nas_transport_roundtrip():
    """DL/UL NAS TRANSPORT carry an opaque SMS-CP container (24.301
    §8.2.12/§8.2.30; reference: liblte_mme_pack_downlink_nas_transport)."""
    sms = bytes([0x09, 0x01, 0x23, 0x0B] + list(range(11)))
    wire = nas.pack_dl_nas_transport(sms)
    assert nas.unpack_dl_nas_transport(wire) == sms
    assert nas.unpack_ul_nas_transport(wire) is None      # wrong MT
    wire = nas.pack_ul_nas_transport(sms)
    assert nas.unpack_ul_nas_transport(wire) == sms
    # truncated container -> None, no raise
    assert nas.unpack_ul_nas_transport(wire[:-3]) is None
    assert nas.unpack_ul_nas_transport(b"\x07") is None
