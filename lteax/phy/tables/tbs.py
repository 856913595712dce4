"""Transport block size and MCS tables (36.213 §7.1.7).

(reference capability: ``liblte/src/liblte_phy.cc ::
liblte_phy_get_tbs_mcs_and_n_prb_for_dl`` / ``liblte_phy_get_tbs_and_n_prb_for_dl``.)

PROVENANCE: /root/reference is an empty mount (SURVEY.md); Table 7.1.7.2.1-1
is reproduced from the 3GPP spec for the N_PRB columns the framework's
configs exercise (DCI-1A columns 2/3, and the standard bandwidth PRB counts).
Entries are validated by tests/test_tables.py for monotonicity and known
anchor values; the remaining columns raise KeyError until entered.
All TBS values here segment uniformly (tests assert it), which the
static-shape device path relies on.
"""

from __future__ import annotations

# 36.213 Table 7.1.7.1-1: MCS -> (modulation order Q_m, I_TBS)
def mcs_to_qm_itbs(mcs: int) -> tuple[int, int]:
    if 0 <= mcs <= 9:
        return 2, mcs
    if 10 <= mcs <= 16:
        return 4, mcs - 1
    if 17 <= mcs <= 28:
        return 6, mcs - 2
    raise ValueError(f"reserved/unsupported MCS {mcs}")


MOD_BY_QM = {2: "qpsk", 4: "16qam", 6: "64qam"}

# 36.213 Table 7.1.7.2.1-1 — columns for supported N_PRB (I_TBS 0..26).
TBS_COLUMNS: dict[int, tuple[int, ...]] = {
    1: (16, 24, 32, 40, 56, 72, 88, 104, 120, 136, 144, 176, 208, 224, 256,
        280, 328, 336, 376, 408, 440, 488, 520, 552, 584, 616, 712),
    2: (32, 56, 72, 104, 120, 144, 176, 224, 256, 296, 328, 376, 440, 488,
        552, 600, 632, 696, 776, 840, 904, 1000, 1064, 1128, 1192, 1256, 1480),
    3: (56, 88, 144, 176, 208, 224, 256, 328, 392, 456, 504, 584, 680, 744,
        840, 904, 968, 1064, 1160, 1288, 1384, 1480, 1608, 1736, 1800, 1864, 2216),
    4: (88, 144, 176, 208, 256, 328, 392, 472, 536, 616, 680, 776, 904,
        1000, 1128, 1224, 1288, 1480, 1608, 1800, 1928, 2088, 2216, 2344,
        2536, 2664, 2984),
    5: (120, 176, 208, 256, 328, 424, 504, 584, 680, 776, 872, 1000, 1128,
        1256, 1416, 1544, 1608, 1800, 2024, 2216, 2408, 2600, 2792, 2984,
        3112, 3368, 3752),
    6: (152, 208, 256, 328, 408, 504, 600, 712, 808, 936, 1032, 1192, 1352,
        1544, 1736, 1800, 1928, 2152, 2344, 2600, 2792, 2984, 3240, 3496,
        3752, 4008, 4392),
    15: (392, 520, 648, 872, 1064, 1320, 1544, 1800, 2024, 2280, 2600, 2984,
         3368, 3752, 4136, 4392, 4584, 5160, 5544, 6200, 6712, 7224, 7736,
         7992, 8504, 9144, 9912),
    25: (680, 904, 1096, 1416, 1800, 2216, 2600, 3112, 3496, 4008, 4392,
         4968, 5736, 6456, 7224, 7736, 7992, 9144, 9912, 11064, 12216,
         12960, 14112, 14688, 15264, 16416, 18336),
    50: (1384, 1800, 2216, 2856, 3624, 4392, 5160, 6200, 6968, 7992, 8760,
         9912, 11448, 12960, 14112, 15264, 16416, 18336, 19848, 22152,
         23688, 25456, 27376, 28336, 30576, 31704, 36696),
    75: (2088, 2728, 3368, 4392, 5352, 6712, 7736, 9144, 10296, 11832,
         12960, 14688, 17568, 19080, 21384, 22920, 24496, 27376, 29296,
         32856, 35160, 37888, 40576, 42368, 45352, 46888, 55056),
    100: (2792, 3624, 4584, 5736, 7224, 8760, 10296, 12216, 14112, 15840,
          17568, 19848, 22920, 25456, 28336, 30576, 32856, 36696, 39232,
          43816, 46888, 51024, 55056, 57336, 61664, 63776, 75376),
}


from functools import lru_cache


@lru_cache(maxsize=None)
def _allowed_uniform_tbs() -> tuple[int, ...]:
    """All TBS values whose 36.212 §5.1.2 segmentation is uniform (a single
    code-block size K, zero filler): TBS = C*(K-24) - 24 for valid K.
    Every entry of Table 7.1.7.2.1-1 lies in this set — it is both a
    transcription checksum and the quantization grid for ``interp``."""
    from lteax.phy.tables.turbo_qpp import VALID_K
    from lteax.phy.fec.segmentation import segment_info

    out = set()
    for k in VALID_K:
        out.add(int(k) - 24)                       # C == 1
    for c in range(2, 66):                          # covers up to ~400k bits
        for k in VALID_K:
            out.add(c * (int(k) - 24) - 24)
    good = [t for t in sorted(out) if t > 0
            and segment_info(t + 24).c_minus == 0
            and segment_info(t + 24).f == 0]
    return tuple(good)


@lru_cache(maxsize=None)
def _se_target(i_tbs: int) -> float:
    """Per-row spectral-efficiency target ((TBS+24)/(120*N_PRB)) fitted to
    the wide verified columns.  Used ONLY by the ``interp`` fallback."""
    import numpy as np
    ns = [n for n in (25, 50, 75, 100) if n in TBS_COLUMNS]
    return float(np.median([(TBS_COLUMNS[n][i_tbs] + 24) / (120.0 * n)
                            for n in ns]))


@lru_cache(maxsize=None)
def _tbs_interp(i_tbs: int, n_prb: int) -> int:
    """Rule-based TBS for a column not transcribed from the spec.

    NOT spec-exact (scripts/tbs_fit.py shows Table 7.1.7.2.1-1 is hand-
    adjusted and cannot be reproduced by any quantization rule); this picks
    the largest uniformly-segmenting TBS at the row's fitted spectral
    efficiency, clamped to be monotone against the bracketing verified
    columns.  Self-consistent across gen/scan/scheduler, flagged here so no
    caller mistakes it for the 3GPP entry."""
    import bisect
    allowed = _allowed_uniform_tbs()
    target = _se_target(i_tbs) * 120.0 * n_prb
    j = bisect.bisect_right([t + 24 for t in allowed], target)
    t = allowed[max(j - 1, 0)]
    known = sorted(TBS_COLUMNS)
    lo = max((n for n in known if n < n_prb), default=None)
    hi = min((n for n in known if n > n_prb), default=None)
    if lo is not None:
        t = max(t, TBS_COLUMNS[lo][i_tbs])
    if hi is not None:
        t = min(t, TBS_COLUMNS[hi][i_tbs])
    return int(t)


def get_tbs(i_tbs: int, n_prb: int, interp: bool = False) -> int:
    """36.213 Table 7.1.7.2.1-1 lookup.

    Spec-exact for the transcribed columns (all standard bandwidth PRB
    counts, the DCI-1A columns and 1..6); other columns raise KeyError
    unless ``interp=True`` opts into the rule-based fallback (see
    ``_tbs_interp`` — self-consistent, NOT guaranteed spec-exact)."""
    if not 0 <= i_tbs <= 26:
        raise ValueError(f"I_TBS {i_tbs} out of range")
    if not 1 <= n_prb <= 110:
        raise ValueError(f"N_PRB {n_prb} out of range")
    if n_prb in TBS_COLUMNS:
        return TBS_COLUMNS[n_prb][i_tbs]
    if not interp:
        raise KeyError(
            f"N_PRB={n_prb} column of 36.213 Table 7.1.7.2.1-1 not "
            f"transcribed (have {sorted(TBS_COLUMNS)}); pass interp=True "
            f"for the rule-based fallback")
    return _tbs_interp(i_tbs, n_prb)


def get_tbs_for_mcs(mcs: int, n_prb: int, interp: bool = False
                    ) -> tuple[int, str]:
    """-> (tbs, modulation scheme name)."""
    qm, itbs = mcs_to_qm_itbs(mcs)
    return get_tbs(itbs, n_prb, interp), MOD_BY_QM[qm]


# 36.213 §7.1.7.2: DCI format 1A with SI/P/RA-RNTI uses N_PRB_1A ∈ {2, 3}
# selected by the TPC LSB, as the TBS column regardless of actual PRBs.
def tbs_1a(i_tbs: int, n_prb_1a: int) -> int:
    assert n_prb_1a in (2, 3)
    return get_tbs(i_tbs, n_prb_1a)


def pick_mcs_for_size(n_bits: int, n_prb: int, max_mcs: int = 28,
                      interp: bool = False) -> tuple[int, int]:
    """Smallest MCS whose TBS at ``n_prb`` fits ``n_bits`` payload.

    (reference capability: ``liblte_phy_get_tbs_mcs_and_n_prb_for_dl`` —
    the scheduler's lookup.)  Returns (mcs, tbs)."""
    for mcs in range(max_mcs + 1):
        try:
            tbs, _ = get_tbs_for_mcs(mcs, n_prb, interp)
        except ValueError:
            continue
        if tbs >= n_bits:
            return mcs, tbs
    raise ValueError(f"{n_bits} bits exceed TBS at {n_prb} PRB")
