"""Turbo encoder/decoder (36.212 §5.1.3.2)."""

import numpy as np
import jax.numpy as jnp

from lteax.phy.tables.turbo_qpp import QPP_TABLE, qpp_interleaver
from lteax.phy.fec.turbo import turbo_encode, turbo_decode, turbo_encode_batch, turbo_decode_batch


def test_qpp_all_permutations():
    assert len(QPP_TABLE) == 188
    expect = (list(range(40, 512, 8)) + list(range(512, 1024, 16))
              + list(range(1024, 2048, 32)) + list(range(2048, 6145, 64)))
    assert sorted(QPP_TABLE) == expect
    for k in QPP_TABLE:
        pi = qpp_interleaver(k)
        assert len(np.unique(pi)) == k, f"K={k} not a permutation"
        f1, f2 = QPP_TABLE[k]
        assert f1 % 2 == 1 and f2 % 2 == 0, f"K={k} f1 must be odd, f2 even"


def _rsc_ref(bits):
    """Serial reference RSC: g0=1+D^2+D^3 feedback, g1=1+D+D^3."""
    d1 = d2 = d3 = 0
    par = []
    for b in bits:
        w = b ^ d2 ^ d3
        z = w ^ d1 ^ d3
        par.append(z)
        d1, d2, d3 = w, d1, d2
    xt, zt = [], []
    for _ in range(3):
        b = d2 ^ d3
        z = 0 ^ d1 ^ d3
        xt.append(b)
        zt.append(z)
        d1, d2, d3 = 0, d1, d2
    assert (d1, d2, d3) == (0, 0, 0)
    return np.array(par), np.array(xt), np.array(zt)


def test_encoder_matches_serial_reference():
    rng = np.random.default_rng(0)
    k = 40
    bits = rng.integers(0, 2, size=k).astype(np.int32)
    d = np.asarray(turbo_encode(jnp.asarray(bits), k))
    assert d.shape == (3, k + 4)
    p1, xt1, zt1 = _rsc_ref(bits)
    pi = qpp_interleaver(k)
    p2, xt2, zt2 = _rsc_ref(bits[pi])
    np.testing.assert_array_equal(d[0, :k], bits)
    np.testing.assert_array_equal(d[1, :k], p1)
    np.testing.assert_array_equal(d[2, :k], p2)
    np.testing.assert_array_equal(d[0, k:], [xt1[0], zt1[1], xt2[0], zt2[1]])
    np.testing.assert_array_equal(d[1, k:], [zt1[0], xt1[2], zt2[0], xt2[2]])
    np.testing.assert_array_equal(d[2, k:], [xt1[1], zt1[2], xt2[1], zt2[2]])


def test_decode_noiseless():
    rng = np.random.default_rng(1)
    for k in (40, 96, 512):
        bits = rng.integers(0, 2, size=k).astype(np.int32)
        d = np.asarray(turbo_encode(jnp.asarray(bits), k)).astype(np.float32)
        llr = jnp.asarray(1.0 - 2.0 * d) * 4.0
        dec = np.asarray(turbo_decode(llr, k, n_iter=4))
        np.testing.assert_array_equal(dec, bits, err_msg=f"K={k}")


def test_decode_awgn():
    """Rate-1/3 turbo at Eb/N0 ~ 1.5 dB should essentially always decode."""
    rng = np.random.default_rng(2)
    k = 1024
    ebn0_db = 1.5
    rate = k / (3 * k + 12)
    esn0 = 10 ** (ebn0_db / 10) * rate
    sigma = float(np.sqrt(1.0 / (2 * esn0)))
    fails = 0
    for _ in range(5):
        bits = rng.integers(0, 2, size=k).astype(np.int32)
        d = np.asarray(turbo_encode(jnp.asarray(bits), k)).astype(np.float32)
        tx = 1.0 - 2.0 * d
        rx = tx + sigma * rng.standard_normal(tx.shape).astype(np.float32)
        llr = jnp.asarray(2.0 * rx / sigma**2)
        dec = np.asarray(turbo_decode(llr, k, n_iter=6))
        fails += int((dec != bits).any())
    assert fails == 0, f"{fails}/5 block errors at Eb/N0={ebn0_db} dB"


def test_decode_high_rate_punctured():
    """MCS28-class rate (~0.88) heavy puncturing: windowed decoder must
    converge via NII even with short acquisition (regression for the
    20 MHz bench 0/16 CRC failure)."""
    from lteax.phy.fec.ratematch import turbo_rm_indices, rate_match, rate_unmatch
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    k = 5824
    e_len = int(k / 0.88)
    idx = turbo_rm_indices(k + 4, e_len, rv=0)
    bits = rng.integers(0, 2, size=k).astype(np.int32)
    d = turbo_encode(jnp.asarray(bits), k)
    e = np.asarray(rate_match(d, idx)).astype(np.float32)
    esn0_db = 23.0   # 64QAM r~0.88 operating point equivalent (BPSK proxy)
    sigma = float(np.sqrt(1.0 / (2 * 10 ** (esn0_db / 10))))
    rx = (1.0 - 2.0 * e) + sigma * rng.standard_normal(e.shape).astype(np.float32)
    llr = rate_unmatch(jnp.asarray(2.0 * rx / sigma**2), idx, k + 4)
    dec = np.asarray(turbo_decode(llr, k, n_iter=6))
    assert (dec == bits).all(), f"{(dec != bits).sum()} bit errors"


def test_decode_batch_shapes():
    rng = np.random.default_rng(3)
    k = 104
    bits = jnp.asarray(rng.integers(0, 2, size=(4, k)).astype(np.int32))
    d = turbo_encode_batch(bits, k).astype(jnp.float32)
    llr = (1.0 - 2.0 * d) * 4.0
    dec = turbo_decode_batch(llr, k, n_iter=3)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))
