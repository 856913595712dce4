"""RRC broadcast message codecs: MIB (exact 36.331 §6.2.2) and a structured
SIB1/SIB2 subset.

(reference capability: ``liblte/src/liblte_rrc.cc ::
liblte_rrc_pack_bcch_bch_msg`` / ``liblte_rrc_unpack_bcch_bch_msg`` /
``liblte_rrc_pack_bcch_dlsch_msg`` / ``liblte_rrc_unpack_bcch_dlsch_msg``.)

MIB packing is bit-exact to 36.331 (it is a fixed 24-bit PER encoding).
SIB1/SIB2 use a deterministic field-ordered packing covering the fields the
scanner reports (PLMN, TAC, cell identity, SI scheduling; RACH/PUSCH common
config skeleton for SIB2).  NOTE: the SIB codec is self-consistent
(gen→scan loopback exact) but not yet UPER-bit-exact to 36.331 — tracked as
a capability-parity TODO; decoded output (JSON) is the scanner's contract.
"""

from __future__ import annotations

import dataclasses

import numpy as np

BW_ENUM = (6, 15, 25, 50, 75, 100)
PHICH_RES_ENUM = (1 / 6, 1 / 2, 1, 2)
PHICH_RES_NAMES = ("1/6", "1/2", "1", "2")


@dataclasses.dataclass
class Mib:
    n_rb_dl: int
    phich_duration_extended: bool
    phich_resource: float      # 1/6, 1/2, 1, 2
    sfn: int                   # full SFN; only sfn>>2 is carried


def pack_mib(m: Mib) -> np.ndarray:
    bits: list[int] = []
    bw = BW_ENUM.index(m.n_rb_dl)
    for i in (2, 1, 0):
        bits.append((bw >> i) & 1)
    bits.append(1 if m.phich_duration_extended else 0)
    res = PHICH_RES_ENUM.index(m.phich_resource)
    for i in (1, 0):
        bits.append((res >> i) & 1)
    sfn8 = (m.sfn >> 2) & 0xFF
    for i in range(7, -1, -1):
        bits.append((sfn8 >> i) & 1)
    bits.extend([0] * 10)
    return np.asarray(bits, dtype=np.int32)


def unpack_mib(bits: np.ndarray, sfn_mod4: int = 0) -> Mib:
    b = [int(x) for x in bits]
    bw = (b[0] << 2) | (b[1] << 1) | b[2]
    dur = bool(b[3])
    res = (b[4] << 1) | b[5]
    sfn8 = 0
    for i in range(8):
        sfn8 = (sfn8 << 1) | b[6 + i]
    return Mib(n_rb_dl=BW_ENUM[bw], phich_duration_extended=dur,
               phich_resource=PHICH_RES_ENUM[res],
               sfn=(sfn8 << 2) | (sfn_mod4 & 3))


# ---------------------------------------------------------------------------
# SIB1 / SIB2 subset
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, width: int):
        for i in range(width - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def array(self) -> np.ndarray:
        return np.asarray(self.bits, dtype=np.int32)


class _BitReader:
    def __init__(self, bits):
        self.bits = [int(x) for x in bits]
        self.pos = 0

    def get(self, width: int) -> int:
        v = 0
        for _ in range(width):
            v = (v << 1) | self.bits[self.pos]
            self.pos += 1
        return v


SI_WINDOW_MS = (1, 2, 5, 10, 15, 20, 40)
SI_PERIODICITY_RF = (8, 16, 32, 64, 128, 256, 512)


@dataclasses.dataclass
class SchedulingInfo:
    si_periodicity_rf: int          # radio frames
    sib_mapping: tuple[int, ...]    # SIB type numbers >= 3 mapped to this SI


@dataclasses.dataclass
class Sib1:
    mcc: tuple[int, int, int]
    mnc: tuple[int, ...]            # 2 or 3 digits
    tac: int                        # 16 bit
    cell_identity: int              # 28 bit
    cell_barred: bool = False
    intra_freq_reselection: bool = True
    q_rx_lev_min: int = -70         # * 2 dBm encoded (-70..-22)
    freq_band_indicator: int = 1
    si_window_ms: int = 20
    scheduling: tuple[SchedulingInfo, ...] = ()

MSG_SIB1 = 1
MSG_SI = 0


def pack_sib1(s: Sib1) -> np.ndarray:
    """BCCH-DL-SCH-Message carrying SystemInformationBlockType1, encoded in
    UNALIGNED PER per 36.331 §6.2.2 / X.691.

    ASN.1 field order (Rel-8 SystemInformationBlockType1; optional fields
    p-Max / tdd-Config / csg-Identity / q-RxLevMinOffset /
    nonCriticalExtension absent):
      BCCH-DL-SCH-MessageType CHOICE: c1(0) -> CHOICE: sib1(1)
      SEQUENCE bitmap [p-Max, tdd-Config, nonCriticalExtension]
      cellAccessRelatedInfo: bitmap [csg-Identity];
        plmn-IdentityList SIZE(1..6); PLMN-Identity {mcc OPTIONAL present,
        3x digit(0..9), mnc SIZE(2..3) of digit},
        cellReservedForOperatorUse ENUM{reserved, notReserved};
        trackingAreaCode BIT STRING(16); cellIdentity BIT STRING(28);
        cellBarred ENUM{barred,notBarred};
        intraFreqReselection ENUM{allowed,notAllowed}; csg-Indication BOOLEAN
      cellSelectionInfo: bitmap [q-RxLevMinOffset]; q-RxLevMin INT(-70..-22)
      freqBandIndicator INT(1..64)
      schedulingInfoList SIZE(1..32) of SchedulingInfo {
        si-Periodicity ENUM(rf8..rf512), sib-MappingInfo SIZE(0..31) of
        SIB-Type ENUM(sibType3.., extensible, 16 root values) }
      si-WindowLength ENUM(ms1..ms40); systemInfoValueTag INT(0..31)
    """
    from lteax.stack.uper import UperWriter
    w = UperWriter()
    w.bit(0)                         # BCCH-DL-SCH-MessageType: c1
    w.bit(1)                         # c1: systemInformationBlockType1
    w.opt(False)                     # p-Max absent
    w.opt(False)                     # tdd-Config absent
    w.opt(False)                     # nonCriticalExtension absent
    # cellAccessRelatedInfo
    w.opt(False)                     # csg-Identity absent
    w.length(1, 1, 6)                # one PLMN
    w.opt(True)                      # mcc present
    for d in s.mcc:
        w.cint(d, 0, 9)
    w.length(len(s.mnc), 2, 3)
    for d in s.mnc:
        w.cint(d, 0, 9)
    w.enum(1, 2)                     # cellReservedForOperatorUse: notReserved
    w.bitstring(s.tac, 16)
    w.bitstring(s.cell_identity, 28)
    w.enum(0 if s.cell_barred else 1, 2)
    w.enum(0 if s.intra_freq_reselection else 1, 2)
    w.bit(0)                         # csg-Indication FALSE
    # cellSelectionInfo
    w.opt(False)                     # q-RxLevMinOffset absent
    w.cint(s.q_rx_lev_min, -70, -22)
    w.cint(s.freq_band_indicator, 1, 64)
    w.length(len(s.scheduling), 1, 32)
    for si in s.scheduling:
        w.enum(SI_PERIODICITY_RF.index(si.si_periodicity_rf), 7)
        w.length(len(si.sib_mapping), 0, 31)
        for t in si.sib_mapping:
            w.enum(t - 3, 16, extensible=True)   # SIB-Type
    w.enum(SI_WINDOW_MS.index(s.si_window_ms), 7)
    w.cint(0, 0, 31)                 # systemInfoValueTag
    return w.array()


def unpack_sib1(bits: np.ndarray) -> Sib1 | None:
    from lteax.stack.uper import UperReader
    try:
        r = UperReader(bits)
        if r.bit() != 0 or r.bit() != 1:
            return None              # not c1/sib1
        opt_pmax, opt_tdd, opt_ext = r.opt(), r.opt(), r.opt()
        opt_csg_id = r.opt()
        n_plmn = r.length(1, 6)
        mcc = (0, 0, 0)
        mnc = ()
        for i in range(n_plmn):
            has_mcc = r.opt()
            m = tuple(r.cint(0, 9) for _ in range(3)) if has_mcc else (0, 0, 0)
            nm = r.length(2, 3)
            n = tuple(r.cint(0, 9) for _ in range(nm))
            r.enum(2)                # cellReservedForOperatorUse
            if i == 0:
                mcc, mnc = m, n
        tac = r.bitstring(16)
        cid = r.bitstring(28)
        barred = r.enum(2) == 0
        ifr = r.enum(2) == 0
        r.bit()                      # csg-Indication
        if opt_csg_id:
            r.bitstring(27)
        opt_qoff = r.opt()
        qrx = r.cint(-70, -22)
        if opt_qoff:
            r.cint(1, 8)
        if opt_pmax:
            r.cint(-30, 33)
        band = r.cint(1, 64)
        n_sched = r.length(1, 32)
        sched = []
        for _ in range(n_sched):
            per = SI_PERIODICITY_RF[r.enum(7)]
            n_map = r.length(0, 31)
            sched.append(SchedulingInfo(
                per, tuple(r.enum(16, extensible=True) + 3
                           for _ in range(n_map))))
        if opt_tdd:
            return None              # TDD not supported
        win = SI_WINDOW_MS[r.enum(7)]
        r.cint(0, 31)                # systemInfoValueTag
        return Sib1(mcc=mcc, mnc=mnc, tac=tac, cell_identity=cid,
                    cell_barred=barred, intra_freq_reselection=ifr,
                    q_rx_lev_min=qrx, freq_band_indicator=band,
                    si_window_ms=win, scheduling=tuple(sched))
    except (IndexError, ValueError):
        return None


@dataclasses.dataclass
class Sib2:
    rach_num_ra_preambles: int = 52
    rach_preamble_init_power: int = -104
    prach_config_index: int = 3
    prach_freq_offset: int = 2
    pusch_n_sb: int = 1
    pusch_hopping_mode: int = 0
    pdsch_ref_power: int = -60
    pucch_delta_shift: int = 1
    ul_bandwidth_rb: int = 6
    ul_carrier_freq_earfcn: int = 18000


def pack_sib2(s: Sib2) -> np.ndarray:
    w = _BitWriter()
    w.put(MSG_SI, 2)
    w.put(2, 5)                       # SIB type tag
    w.put(s.rach_num_ra_preambles, 6)
    w.put(s.rach_preamble_init_power + 130, 6)
    w.put(s.prach_config_index, 6)
    w.put(s.prach_freq_offset, 7)
    w.put(s.pusch_n_sb, 2)
    w.put(s.pusch_hopping_mode, 1)
    w.put(s.pdsch_ref_power + 70, 7)
    w.put(s.pucch_delta_shift, 2)
    w.put(s.ul_bandwidth_rb, 7)
    w.put(s.ul_carrier_freq_earfcn, 18)
    return w.array()


def unpack_si(bits: np.ndarray):
    """Unpack a SystemInformation message -> ("sib2", Sib2) | None."""
    try:
        r = _BitReader(bits)
        if r.get(2) != MSG_SI:
            return None
        t = r.get(5)
        if t == 2:
            return "sib2", Sib2(
                rach_num_ra_preambles=r.get(6),
                rach_preamble_init_power=r.get(6) - 130,
                prach_config_index=r.get(6),
                prach_freq_offset=r.get(7),
                pusch_n_sb=r.get(2),
                pusch_hopping_mode=r.get(1),
                pdsch_ref_power=r.get(7) - 70,
                pucch_delta_shift=r.get(2),
                ul_bandwidth_rb=r.get(7),
                ul_carrier_freq_earfcn=r.get(18),
            )
        return None
    except (IndexError, ValueError):
        return None


@dataclasses.dataclass
class Sib3:
    q_hyst_db: int = 2
    s_non_intra_search: int = 6
    thresh_serving_low: int = 4
    cell_resel_priority: int = 4
    q_rx_lev_min: int = -70
    t_resel_eutra_s: int = 1


def pack_sib3(s: Sib3) -> np.ndarray:
    w = _BitWriter()
    w.put(MSG_SI, 2)
    w.put(3, 5)
    w.put(s.q_hyst_db, 4)
    w.put(s.s_non_intra_search, 5)
    w.put(s.thresh_serving_low, 5)
    w.put(s.cell_resel_priority, 3)
    w.put(s.q_rx_lev_min + 70, 6)
    w.put(s.t_resel_eutra_s, 3)
    return w.array()


@dataclasses.dataclass
class Paging:
    ue_identities: tuple[int, ...] = ()     # S-TMSI (32-bit subset)
    system_info_modification: bool = False


def pack_paging(p: Paging) -> np.ndarray:
    """PCCH paging message (36.331 §6.2.2 Paging, subset)."""
    w = _BitWriter()
    w.put(2, 2)                 # PCCH message tag (distinct from SIB1/SI)
    w.put(1 if p.system_info_modification else 0, 1)
    w.put(len(p.ue_identities), 3)
    for tmsi in p.ue_identities:
        w.put(tmsi, 32)
    return w.array()


def unpack_paging(bits: np.ndarray) -> Paging | None:
    try:
        r = _BitReader(bits)
        if r.get(2) != 2:
            return None
        sim = bool(r.get(1))
        n = r.get(3)
        ids = tuple(r.get(32) for _ in range(n))
        return Paging(ue_identities=ids, system_info_modification=sim)
    except (IndexError, ValueError):
        return None


def unpack_si_ext(bits: np.ndarray):
    """Extended SI unpack: returns ("sib2", Sib2) | ("sib3", Sib3) | None."""
    got = unpack_si(bits)
    if got is not None:
        return got
    try:
        r = _BitReader(bits)
        if r.get(2) != MSG_SI or r.get(5) != 3:
            return None
        return "sib3", Sib3(
            q_hyst_db=r.get(4), s_non_intra_search=r.get(5),
            thresh_serving_low=r.get(5), cell_resel_priority=r.get(3),
            q_rx_lev_min=r.get(6) - 70, t_resel_eutra_s=r.get(3))
    except (IndexError, ValueError):
        return None


def pad_to(bits: np.ndarray, n: int) -> np.ndarray:
    """Pad a message to transport block size with zeros."""
    if len(bits) > n:
        raise ValueError(f"message ({len(bits)}b) exceeds TBS {n}")
    return np.concatenate([bits, np.zeros(n - len(bits), dtype=bits.dtype)])
