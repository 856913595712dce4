"""Code block segmentation (36.212 §5.1.2): sizes, uniform + mixed K paths."""

import numpy as np
import jax.numpy as jnp

from lteax.phy.fec.segmentation import (segment_info, segment_bits,
                                        desegment_bits, segment_bits_general,
                                        desegment_bits_general, k_buckets)
from lteax.phy.fec.crc import attach_crc_np, check_crc
from lteax.phy.fec.turbo import turbo_encode, turbo_decode
from lteax.phy.tables.turbo_qpp import VALID_K


def test_segment_sizes_spec_cases():
    # single block, no CB CRC
    si = segment_info(40)
    assert (si.c, si.cb_crc, si.k_plus, si.f) == (1, False, 40, 0)
    # single max-size block
    si = segment_info(6144)
    assert (si.c, si.k_plus, si.f) == (1, 6144, 0)
    # just over the edge: two blocks, CRC24B, mixed K
    si = segment_info(6145)
    assert (si.c, si.cb_crc) == (2, True)
    assert (si.k_plus, si.k_minus, si.c_plus, si.c_minus, si.f) == \
        (3136, 3072, 1, 1, 15)
    # total capacity identity: sum(K_r) == B + C*24 + F
    for b in (6145, 9000, 20000, 50000):
        si = segment_info(b)
        assert sum(si.k_list) == b + si.c * 24 + si.f
        assert all(k in VALID_K for k in si.k_list)


def test_uniform_roundtrip():
    rng = np.random.default_rng(0)
    si = segment_info(12960 + 24)
    assert si.uniform
    bits = rng.integers(0, 2, size=si.b)
    blocks = segment_bits(bits, si)
    np.testing.assert_array_equal(desegment_bits(blocks, si), bits)
    # general path must agree with the uniform fast path
    gen = segment_bits_general(bits, si)
    np.testing.assert_array_equal(np.stack(gen), blocks)


def test_mixed_k_roundtrip_through_turbo():
    """B=6145 -> C=2 blocks of different K; encode/decode each K bucket as
    its own static-shape device batch, reassemble bit-exactly."""
    rng = np.random.default_rng(1)
    si = segment_info(6145)
    assert not si.uniform and k_buckets(si) == [(3072, [0]), (3136, [1])]
    bits = rng.integers(0, 2, size=si.b)
    payloads = segment_bits_general(bits, si)

    decoded = [None] * si.c
    for k, idxs in k_buckets(si):
        for ci in idxs:
            cb = attach_crc_np(payloads[ci], "24B")
            assert len(cb) == k
            d = turbo_encode(jnp.asarray(cb), k)          # (3, K+4)
            llr = 1.0 - 2.0 * np.asarray(d, dtype=np.float32)
            got = turbo_decode(jnp.asarray(llr), k, n_iter=4)
            got = np.asarray(got)
            _, ok = check_crc(jnp.asarray(got), "24B")
            assert bool(np.asarray(ok))
            decoded[ci] = got[:-24]
    back = desegment_bits_general(decoded, si)
    np.testing.assert_array_equal(back, bits)
