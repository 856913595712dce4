"""PRACH logical-root table (36.211 Table 5.7.2-4) + restricted sets.

The 838-entry table is generated from its design rule
(scripts/prach_root_order.py); these tests pin the structural invariants,
the independently recalled spec fragments, and the restricted-set shift
machinery, plus a high-speed gen->detect roundtrip.
"""
import numpy as np

from lteax.phy.channels import prach
from lteax.phy.tables.prach_roots import LOGICAL_ROOT_ORDER

N = 839


def test_table_structure():
    assert len(LOGICAL_ROOT_ORDER) == 838
    assert sorted(LOGICAL_ROOT_ORDER) == list(range(1, N))
    # adjacent entries pair as (u, N - u), smaller first
    for i in range(0, 838, 2):
        a, b = LOGICAL_ROOT_ORDER[i], LOGICAL_ROOT_ORDER[i + 1]
        assert a + b == N and a < b, i


def test_table_spec_fragments():
    # independently recalled fragments of the normative table
    assert LOGICAL_ROOT_ORDER[:24] == (
        129, 710, 140, 699, 120, 719, 210, 629, 168, 671, 84, 755,
        105, 734, 93, 746, 70, 769, 60, 779, 2, 837, 1, 838)
    assert LOGICAL_ROOT_ORDER[24:40] == (
        56, 783, 112, 727, 148, 691, 80, 759, 42, 797, 40, 799,
        35, 804, 73, 766)
    assert LOGICAL_ROOT_ORDER[-4:] == (305, 534, 336, 503)
    assert prach.physical_root(0) == 129
    assert prach.physical_root(837) == 503


def test_ncs_tables():
    assert len(prach.NCS_UNRESTRICTED) == 16
    assert len(prach.NCS_RESTRICTED) == 15
    assert prach.NCS_UNRESTRICTED[1] == 13
    assert prach.NCS_RESTRICTED[0] == 15


def test_unrestricted_shifts():
    assert prach.cyclic_shifts(129, 13, restricted=False) == \
        [13 * v for v in range(64)]
    assert prach.cyclic_shifts(129, 0, restricted=False) == [0]


def test_restricted_shifts_formula():
    # d_u = 15 (u=56), N_cs=15: branch 1 -> n_shift=1, d_start=45,
    # n_group=18, n_bar=0 -> 18 shifts at 45*g
    s = prach.cyclic_shifts(56, 15, restricted=True)
    assert s == [45 * g for g in range(18)]
    # d_u = 412 (u=112), N_cs=15: branch 2 -> n_shift=1, d_start=30,
    # n_group=13, n_bar=1 -> 14 shifts at 30*g
    s = prach.cyclic_shifts(112, 15, restricted=True)
    assert len(s) == 14 and s[:3] == [0, 30, 60]
    # unusable root (d_u=13 < N_cs): no restricted shifts
    assert prach.cyclic_shifts(129, 15, restricted=True) == []
    # all shifts stay inside the sequence and are unique
    for u in (56, 112, 148, 40, 35):
        for ncs in prach.NCS_RESTRICTED:
            s = prach.cyclic_shifts(u, ncs, restricted=True)
            assert len(set(s)) == len(s)
            assert all(0 <= cv < N for cv in s)


def test_preamble_set_unrestricted():
    # zczc=12 -> N_cs=119 -> 7 shifts/root -> 64 preambles span 10 roots
    pset = prach.preamble_set(0, 12, high_speed=False)
    assert len(pset) == 64
    assert pset[0] == (129, 0) and pset[6] == (129, 6 * 119)
    assert pset[7][0] == 710
    roots = {u for u, _ in pset}
    assert len(roots) == 10


def test_preamble_set_high_speed_skips_unusable_roots():
    # logical 0.. roots are high-speed-unusable; the set must come from
    # logical >= 24 (first restricted-capable root is u=56)
    pset = prach.preamble_set(0, 0, high_speed=True)   # N_cs=15
    assert len(pset) == 64
    assert pset[0][0] == 56
    unusable = set(LOGICAL_ROOT_ORDER[:24])
    assert all(u not in unusable for u, _ in pset)


def test_high_speed_gen_detect_roundtrip():
    pset = prach.preamble_set(0, 0, high_speed=True)
    rng = np.random.default_rng(3)
    for idx in (0, 17, 40):
        u, cv = pset[idx]
        burst = prach.generate_prach_cv(u, cv)
        ncp = prach.PRACH_FORMATS[0][0]
        rx = burst + (rng.standard_normal(burst.shape)
                      + 1j * rng.standard_normal(burst.shape)
                      ).astype(np.complex64) * 0.05
        shifts = prach.cyclic_shifts(u, 15, restricted=True)
        dets = prach.detect_prach_cv(rx[ncp:], u, shifts, 15)
        assert len(dets) == 1
        i, delay, m = dets[0]
        assert shifts[i] == cv and delay == 0 and m > 8.0
