"""Independent spot vectors for spec constants and wire formats.

Every expected value here is derived in THIS file from the published
3GPP/X.691 definitions (explicit formulas, bitwise long division, literal
bit strings hand-derived from the ASN.1 grammar) — never by calling the
production code path being tested.  This breaks the self-referential loop
of the generated golden fixtures (tests/golden): if a production table or
packer were mis-transcribed, these tests fail even though the loopback
round-trips stay green.

Sources (re-derivations, not copies): 36.211 §6.11.1/§6.11.2 (PSS/SSS),
§7.2 (Gold), 36.212 §5.1.1 (CRC polynomials), §5.1.3.2.3 Table 5.1.3-3
(QPP spot rows), 36.331 §6.2.2 + X.691 (MIB/SIB1 UPER).
"""

import cmath

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# PSS: Zadoff-Chu roots 25/29/34 (36.211 §6.11.1.1)
#   d_u(n) = exp(-j pi u n(n+1)/63)        n = 0..30
#   d_u(n) = exp(-j pi u (n+1)(n+2)/63)    n = 31..61
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_id_2,root", [(0, 25), (1, 29), (2, 34)])
def test_pss_matches_zc_formula(n_id_2, root):
    from lteax.phy.seq import pss_sequence

    expect = np.empty(62, dtype=np.complex64)
    for n in range(31):
        expect[n] = cmath.exp(-1j * cmath.pi * root * n * (n + 1) / 63)
    for n in range(31, 62):
        expect[n] = cmath.exp(-1j * cmath.pi * root * (n + 1) * (n + 2) / 63)
    got = np.asarray(pss_sequence(n_id_2))
    assert got.shape == (62,)
    np.testing.assert_allclose(got, expect, atol=1e-5)


# ---------------------------------------------------------------------------
# SSS (36.211 §6.11.2.1): re-derive the s/c/z m-sequences from their x^5
# LFSR recursions and the m0/m1 mapping, for a few cell IDs.
# ---------------------------------------------------------------------------

def _lfsr31(taps):
    """x(i+5) = sum(x(i+t) for t in taps) mod 2, x = (0,0,0,0,1)."""
    x = [0, 0, 0, 0, 1]
    for i in range(26):
        x.append(sum(x[i + t] for t in taps) % 2)
    return np.array([1 - 2 * v for v in x])          # s~(i) = 1 - 2 x(i)


@pytest.mark.parametrize("n_id_1", [0, 1, 167])
@pytest.mark.parametrize("n_id_2", [0, 2])
@pytest.mark.parametrize("subframe5", [False, True])
def test_sss_matches_spec_equations(n_id_1, n_id_2, subframe5):
    from lteax.phy.seq import sss_sequence

    s_t = _lfsr31((0, 2))            # x5 = x2 + x0  (s~)
    c_t = _lfsr31((0, 3))            # x5 = x3 + x0  (c~)
    z_t = _lfsr31((0, 1, 2, 4))     # x5 = x4+x2+x1+x0  (z~)

    # m0/m1 from N_id_1 (36.211 Table 6.11.2.1-1 generation rule)
    q_p = n_id_1 // 30
    q = (n_id_1 + q_p * (q_p + 1) // 2) // 30
    m_p = n_id_1 + q * (q + 1) // 2
    m0 = m_p % 31
    m1 = (m0 + m_p // 31 + 1) % 31

    s0 = np.array([s_t[(n + m0) % 31] for n in range(31)])
    s1 = np.array([s_t[(n + m1) % 31] for n in range(31)])
    c0 = np.array([c_t[(n + n_id_2) % 31] for n in range(31)])
    c1 = np.array([c_t[(n + n_id_2 + 3) % 31] for n in range(31)])
    z0 = np.array([z_t[(n + (m0 % 8)) % 31] for n in range(31)])
    z1 = np.array([z_t[(n + (m1 % 8)) % 31] for n in range(31)])

    expect = np.empty(62)
    if not subframe5:                # subframe 0
        expect[0::2] = s0 * c0
        expect[1::2] = s1 * c1 * z0
    else:                            # subframe 5: m0/m1 swapped
        expect[0::2] = s1 * c0
        expect[1::2] = s0 * c1 * z1
    got = np.asarray(sss_sequence(n_id_1, n_id_2, subframe5))
    np.testing.assert_array_equal(np.sign(np.real(got)).astype(int),
                                  np.sign(expect).astype(int))


# ---------------------------------------------------------------------------
# Gold sequence (36.211 §7.2): explicit LFSR recomputation.
#   x1: x1(i+31) = x1(i+3) + x1(i), init x1(0)=1 else 0
#   x2: x2(i+31) = x2(i+3) + x2(i+2) + x2(i+1) + x2(i), init = c_init bits
#   c(n) = x1(n + 1600) + x2(n + 1600) mod 2
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("c_init", [0, 1, 0x1F2A, (2 ** 31 - 1) ^ 0x55])
def test_gold_sequence_matches_lfsr(c_init):
    from lteax.phy.seq import gold_sequence_np

    n = 128
    nc = 1600
    x1 = [0] * (nc + n + 31)
    x2 = [0] * (nc + n + 31)
    x1[0] = 1
    for i in range(31):
        x2[i] = (c_init >> i) & 1
    for i in range(nc + n):
        x1[i + 31] = (x1[i + 3] + x1[i]) % 2
        x2[i + 31] = (x2[i + 3] + x2[i + 2] + x2[i + 1] + x2[i]) % 2
    expect = [(x1[i + nc] + x2[i + nc]) % 2 for i in range(n)]
    got = np.asarray(gold_sequence_np(c_init, n))
    np.testing.assert_array_equal(got, expect)


# ---------------------------------------------------------------------------
# CRC (36.212 §5.1.1): bitwise long division against the published
# generator polynomials, independent of the GF(2) matrix path.
#   gCRC24A = x^24 + x^23 + x^18 + x^17 + x^14 + x^11 + x^10 + x^7 + x^6
#             + x^5 + x^4 + x^3 + x + 1                 -> 0x864CFB
#   gCRC24B = x^24 + x^23 + x^6 + x^5 + x + 1           -> 0x800063
#   gCRC16  = x^16 + x^12 + x^5 + 1                     -> 0x11021
#   gCRC8   = x^8 + x^7 + x^4 + x^3 + x + 1             -> 0x19B
# ---------------------------------------------------------------------------

def _crc_longdiv(bits, poly, width):
    reg = 0
    for b in bits:
        reg = (reg << 1) | int(b)
        if reg >> width:
            reg ^= poly | (1 << width)
    for _ in range(width):
        reg <<= 1
        if reg >> width:
            reg ^= poly | (1 << width)
    return [(reg >> i) & 1 for i in range(width - 1, -1, -1)]


@pytest.mark.parametrize("kind,poly,width", [
    ("24A", 0x864CFB & 0xFFFFFF, 24),
    ("24B", 0x800063 & 0xFFFFFF, 24),
    ("16", 0x1021, 16),
    ("8", 0x9B, 8),
])
def test_crc_matches_long_division(kind, poly, width):
    from lteax.phy.fec.crc import crc_np

    rng = np.random.default_rng(7)
    for n in (1, 8, 40, 121):
        bits = rng.integers(0, 2, n).astype(np.int8)
        expect = _crc_longdiv(bits, poly, width)
        got = list(np.asarray(crc_np(bits, kind)).astype(int))
        assert got == expect, (kind, n)


# ---------------------------------------------------------------------------
# Turbo QPP interleaver (36.212 Table 5.1.3-3) spot rows: the first and
# last rows of the published table, independently recalled.
# ---------------------------------------------------------------------------

def test_qpp_spot_rows():
    from lteax.phy.tables.turbo_qpp import QPP_TABLE, qpp_interleaver

    assert QPP_TABLE[40] == (3, 10)          # first row
    assert QPP_TABLE[6144] == (263, 480)     # last row
    assert QPP_TABLE[64] == (7, 16)
    # Pi(i) = (f1*i + f2*i^2) mod K must be a permutation; check K=40 fully
    pi = [(3 * i + 10 * i * i) % 40 for i in range(40)]
    np.testing.assert_array_equal(qpp_interleaver(40), pi)
    assert sorted(pi) == list(range(40))


# ---------------------------------------------------------------------------
# MIB (36.331 §6.2.2 MasterInformationBlock): 24-bit layout
#   dl-Bandwidth ENUM(6) 3b | phich-Duration ENUM(2) 1b | phich-Resource
#   ENUM(4) 2b | systemFrameNumber BIT STRING(8) | spare BIT STRING(10)
# ---------------------------------------------------------------------------

def test_mib_hand_vector():
    from lteax.stack.rrc import Mib, pack_mib, unpack_mib

    # n50 (index 3=011), normal PHICH duration (0), resource one (idx 2=10),
    # SFN 256 -> sfn>>2 = 64 = 01000000, 10 spare zeros
    m = Mib(n_rb_dl=50, phich_duration_extended=False, phich_resource=1,
            sfn=256)
    bits = "".join(["011", "0", "10", "01000000", "0" * 10])
    np.testing.assert_array_equal(pack_mib(m),
                                  [int(b) for b in bits])
    assert unpack_mib(pack_mib(m), sfn_mod4=0) == m


# ---------------------------------------------------------------------------
# SIB1 (36.331 §6.2.2 / X.691 UPER): full-message hand derivation.
# Every field's bits are written out literally below, derived from the
# Rel-8 ASN.1 grammar — an independent transcription checked bit-for-bit
# against the production packer.
# ---------------------------------------------------------------------------

def test_sib1_hand_vector():
    from lteax.stack.rrc import SchedulingInfo, Sib1, pack_sib1, unpack_sib1

    s = Sib1(mcc=(0, 0, 1), mnc=(0, 1), tac=0x1234,
             cell_identity=0x0000010, cell_barred=False,
             intra_freq_reselection=True, q_rx_lev_min=-70,
             freq_band_indicator=1, si_window_ms=20,
             scheduling=(SchedulingInfo(8, (3,)),))

    expect = "".join([
        "0",            # BCCH-DL-SCH-MessageType CHOICE: c1
        "1",            # c1 CHOICE: systemInformationBlockType1
        "0",            # p-Max absent           (SIB1 optional bitmap)
        "0",            # tdd-Config absent
        "0",            # nonCriticalExtension absent
        "0",            # cellAccessRelatedInfo: csg-Identity absent
        "000",          # plmn-IdentityList SIZE(1..6): 1 -> 0 in 3 bits
        "1",            # PLMN-Identity: mcc present
        "0000", "0000", "0001",   # mcc digits 0,0,1 (INTEGER 0..9, 4b each)
        "0",            # mnc SIZE(2..3): 2 -> 0 in 1 bit
        "0000", "0001",           # mnc digits 0,1
        "1",            # cellReservedForOperatorUse: notReserved (idx 1)
        "0001001000110100",       # trackingAreaCode BIT STRING(16) = 0x1234
        "0000000000000000000000010000",  # cellIdentity(28) = 0x0000010
        "1",            # cellBarred: notBarred (idx 1)
        "0",            # intraFreqReselection: allowed (idx 0)
        "0",            # csg-Indication FALSE
        "0",            # cellSelectionInfo: q-RxLevMinOffset absent
        "000000",       # q-RxLevMin INTEGER(-70..-22): -70 -> 0 in 6 bits
        "000000",       # freqBandIndicator INTEGER(1..64): 1 -> 0 in 6 bits
        "00000",        # schedulingInfoList SIZE(1..32): 1 -> 0 in 5 bits
        "000",          # si-Periodicity ENUM rf8 (idx 0 of 7) in 3 bits
        "00001",        # sib-MappingInfo SIZE(0..31): 1 in 5 bits
        "0", "0000",    # SIB-Type: root (ext=0), sibType3 (idx 0 of 16)
        "101",          # si-WindowLength ENUM ms20 (idx 5 of 7)
        "00000",        # systemInfoValueTag INTEGER(0..31) = 0
    ])
    got = "".join(str(int(b)) for b in pack_sib1(s))
    assert got == expect
    assert unpack_sib1(pack_sib1(s)) == s


def test_si_wrapper_hand_vector():
    """SystemInformation header bits preceding the first SIB body."""
    from lteax.stack.rrc import Sib2, pack_si

    bits = "".join(str(int(b)) for b in pack_si(Sib2()))
    expect_prefix = "".join([
        "0",        # BCCH-DL-SCH-MessageType CHOICE: c1
        "0",        # c1 CHOICE: systemInformation
        "0",        # criticalExtensions CHOICE: systemInformation-r8
        "0",        # nonCriticalExtension absent
        "00000",    # sib-TypeAndInfo SIZE(1..32): 1 -> 0 in 5 bits
        "0",        # element CHOICE: root (not extended)
        "0000",     # root index: sib2 (0 of 10) in 4 bits
        "0",        # SystemInformationBlockType2 extension bit
        "0",        # ac-BarringInfo absent
        "0",        # mbsfn-SubframeConfigList absent
        "0",        # RadioResourceConfigCommonSIB extension bit
        "0",        # RACH-ConfigCommon extension bit
        "0",        # preamblesGroupAConfig absent
        "1100",     # numberOfRA-Preambles ENUM(16) idx 12 (n52)
    ])
    assert bits.startswith(expect_prefix)
