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
