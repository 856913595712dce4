"""Structured (slice/concat) rate de-matching == gather/scatter semantics.

The sub-block interleaver decomposes into constant-stride runs in the
column-major d domain (ratematch.make_rate_unmatch_structured); these tests
pin that rewrite to the reference rate_unmatch for assorted (D, E, rv) and
the global PDSCH soft_dematch across the two E classes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lteax.phy.fec.ratematch import (make_rate_unmatch_structured,
                                     rate_unmatch, turbo_rm_indices)
from lteax.phy.channels.pdsch import (pdsch_geometry, soft_dematch,
                                      _global_rm_inv, _structured_dematch)


@pytest.mark.parametrize("d_e_rv", [
    (5828, 6360, 0), (5828, 6352, 0),   # bench MCS28 classes
    (132, 300, 0),                       # repetition-free small block
    (5828, 6360, 2),                     # HARQ rv=2, still injective
    (1060, 900, 0),                      # punctured below buffer
    (5828, 17484, 0),                    # exactly the full circular buffer
])
def test_structured_matches_gather(d_e_rv):
    d_len, e_len, rv = d_e_rv
    out = make_rate_unmatch_structured(d_len, e_len, rv)
    assert out is not None
    fn, n_runs = out
    rng = np.random.default_rng(1)
    e = rng.standard_normal((2, e_len)).astype(np.float32)
    got = np.asarray(jax.jit(fn)(jnp.asarray(e)))
    ref = np.asarray(rate_unmatch(jnp.asarray(e),
                                  turbo_rm_indices(d_len, e_len, rv), d_len))
    np.testing.assert_array_equal(got, ref)


def test_structured_rejects_repetition():
    # E > Ncb wraps the circular buffer -> repetition -> soft combine needed
    assert make_rate_unmatch_structured(132, 2000, 0) is None


def test_global_soft_dematch_structured():
    # 100-PRB MCS28 geometry: 13 codeblocks in two E classes
    geom = pdsch_geometry(75376, 13776, 6, 0)
    assert _structured_dematch(geom) is not None
    rng = np.random.default_rng(2)
    llr = rng.standard_normal((3, geom.g)).astype(np.float32)
    got = np.asarray(jax.jit(lambda x: soft_dematch(x, geom))(jnp.asarray(llr)))
    # reference: the inverse-gather semantics
    inv, injective = _global_rm_inv(geom)
    assert injective
    ext = np.concatenate([llr, np.zeros((3, 1), np.float32)], axis=-1)
    ref = ext[:, inv].reshape(3, geom.info.c, 3, geom.k + 4)
    np.testing.assert_array_equal(got, ref)


def test_unmatch_cycles_equals_scatter_add():
    # wrapped circular buffer (repetition): the occurrence-rank gather
    # decomposition must reproduce the scatter-add soft combine
    from lteax.phy.fec.ratematch import (unmatch_inv_cycles,
                                         rate_unmatch_gather)
    for d_len, e_len, rv in [(132, 2000, 0), (132, 900, 3), (40, 480, 0),
                             (5828, 18000, 1)]:
        idx = turbo_rm_indices(d_len, e_len, rv)
        inv = unmatch_inv_cycles(idx, 3 * d_len)
        assert inv.shape[0] >= 2 or e_len <= 3 * d_len
        rng = np.random.default_rng(3)
        e = rng.standard_normal((2, e_len)).astype(np.float32)
        got = np.asarray(rate_unmatch_gather(jnp.asarray(e), inv, d_len))
        ref = np.asarray(rate_unmatch(jnp.asarray(e), idx, d_len))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


def test_soft_dematch_wrapped_gather_path():
    # a geometry whose E exceeds the circular buffer: soft_dematch must use
    # the cycles gather path and match the scatter-add reference
    from lteax.phy.channels.pdsch import _global_rm_idx, _global_rm_cycles
    geom = pdsch_geometry(40, 300, 2, 0)   # tiny TB, lots of REs -> wrap
    inv, injective = _global_rm_inv(geom)
    assert not injective
    assert _global_rm_cycles(geom).shape[0] >= 2
    rng = np.random.default_rng(4)
    llr = rng.standard_normal((2, geom.g)).astype(np.float32)
    got = np.asarray(jax.jit(lambda x: soft_dematch(x, geom))(jnp.asarray(llr)))
    d_len = geom.k + 4
    ref = np.zeros((2, geom.info.c * 3 * d_len), np.float32)
    np.add.at(ref, (slice(None), _global_rm_idx(geom)), llr)
    np.testing.assert_allclose(
        got.reshape(2, -1), ref, rtol=1e-6, atol=1e-5)


def test_harq_ir_combine_decodes_below_single_rv_snr():
    # rv=0 + rv=2 incremental redundancy: the combined decode must succeed
    # at an SNR where each single transmission fails (verify-skill probe)
    from lteax.phy.channels import pdsch as pd
    from lteax.phy.mod import modulate, demodulate_maxlog
    rng = np.random.default_rng(5)
    tbs, n_re, qm = 1800, 1500, 2       # rate ~0.61 per transmission
    geoms = [pd.pdsch_geometry(tbs, n_re, qm, rv) for rv in (0, 2)]
    tb = rng.integers(0, 2, tbs).astype(np.int32)
    nv = 10 ** (0.5 / 10)               # -0.5 dB Es/N0: single TX fails
    llrs = []
    for g in geoms:
        e = np.asarray(pd.pdsch_encode_bits(tb, g))
        x = np.asarray(modulate(jnp.asarray(e), "qpsk"))
        y = x + (rng.standard_normal(x.shape)
                 + 1j * rng.standard_normal(x.shape)) * np.sqrt(nv / 2)
        llrs.append(demodulate_maxlog(jnp.asarray(y), "qpsk", nv))

    from lteax.phy.fec.turbo import turbo_decode_batch
    from lteax.phy.fec.crc import check_crc
    from lteax.phy.channels.pdsch import desegment_device

    def decode(d_llr, info):
        bits = turbo_decode_batch(d_llr, geoms[0].k, n_iter=6)
        tb_full = desegment_device(bits, info)
        _, ok = check_crc(tb_full, "24A")
        return bool(ok)

    oks_single = [decode(pd.soft_dematch(l, g), g.info)
                  for l, g in zip(llrs, geoms)]
    ok_comb = decode(pd.soft_dematch_harq(llrs, geoms), geoms[0].info)
    assert ok_comb and not all(oks_single)
