"""UE-specific PDCCH search space (36.213 §9.1.1 Y_k hash).

(reference capability: ``liblte_phy.cc :: liblte_phy_pdcch_channel_decode``
blind search over aggregation levels & common/UE search spaces —
SURVEY.md §2.2 PDCCH row.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lteax.phy.config import PhyConfig
from lteax.phy.channels import pdcch
from lteax.phy.channels.dci import Dci1A, dci_1a_pack
from lteax.phy.mod import demodulate_maxlog


def test_yk_recursion_spec():
    """Y_k against a direct transcription of the §9.1.1 recursion."""
    for rnti in (0x3D, 0x100, 0xFFF3):
        y = rnti
        for k in range(10):
            y = (39827 * y) % 65537
            assert pdcch.ue_search_y(rnti, k) == y


def test_ue_candidates_shape_and_hash_dependence():
    n_cces = 41                        # 10 MHz-class control region
    a = pdcch.ue_search_candidates(n_cces, 0x100, 3)
    # M(L) = 6/6/2/2 candidates at L = 1/2/4/8 when space allows
    by_l = {}
    for start, l in a:
        by_l.setdefault(l, []).append(start)
        assert 0 <= start and start + l <= n_cces
        assert start % l == 0
    assert [len(by_l.get(l, [])) for l in (1, 2, 4, 8)] == [6, 6, 2, 2]
    # the hash must move with both RNTI and subframe
    assert a != pdcch.ue_search_candidates(n_cces, 0x101, 3)
    assert a != pdcch.ue_search_candidates(n_cces, 0x100, 4)


def test_search_candidates_merges_spaces():
    n_cces = 41
    merged = pdcch.search_candidates(n_cces, 0x2B7, 6)
    common = pdcch.common_search_candidates(n_cces)
    ue = pdcch.ue_search_candidates(n_cces, 0x2B7, 6)
    assert merged[:len(common)] == common
    assert set(merged) == set(common) | set(ue)
    assert len(merged) == len(set(merged))          # deduped


@pytest.mark.parametrize("rnti,sf", [(0x100, 1), (0x61, 4), (0x2B7, 8)])
def test_blind_decode_finds_ue_space_dcis(rnti, sf):
    """DCIs placed at Y_k-hashed candidates of every aggregation level are
    found by the batched blind decode; placing at a UE-specific (non-common)
    candidate is invisible without ``subframe``."""
    cfg = PhyConfig(n_rb_dl=25)        # 5 MHz: enough CCEs for L=8
    nid, cfi, ng = 214, 3, 1.0
    ncce = pdcch.n_cce(cfg, nid, cfi, ng)
    cands = pdcch.ue_search_candidates(ncce, rnti, sf)
    common = set(pdcch.common_search_candidates(ncce))
    for l_want in (1, 2, 4, 8):
        cand = next((c for c in cands if c[1] == l_want and c not in common),
                    None)
        if cand is None:
            continue
        start, l_agg = cand
        d = Dci1A(rb_start=1, l_crb=6, mcs=7, rv=0, tpc=0)
        bits = dci_1a_pack(d, cfg.n_rb_dl)
        sym = pdcch.pdcch_encode([(bits, rnti, start, l_agg)],
                                 cfg, nid, cfi, ng, sf)[0]
        llr = np.asarray(demodulate_maxlog(sym, "qpsk")) * 4.0
        logical = pdcch.pdcch_llrs_to_logical(jnp.asarray(llr), cfg, nid,
                                              cfi, ng, sf)
        found = pdcch.pdcch_blind_decode_1a(logical, cfg.n_rb_dl, rnti,
                                            ncce, subframe=sf)
        hits = [(s, l) for _, s, l in found]
        assert (start, l_agg) in hits, (l_want, start, hits)
        got = [x for x, s, l in found if (s, l) == (start, l_agg)][0]
        assert (got.rb_start, got.l_crb, got.mcs) == (1, 6, 7)
        # without the UE-specific space the same DCI must be missed
        found_common = pdcch.pdcch_blind_decode_1a(logical, cfg.n_rb_dl,
                                                   rnti, ncce)
        assert (start, l_agg) not in [(s, l) for _, s, l in found_common]
