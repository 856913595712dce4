"""Tail-biting convolutional code + Viterbi (36.212 §5.1.3.1)."""

import numpy as np
import jax.numpy as jnp

from lteax.phy.fec.conv import conv_encode, CONV_GEN, CONV_K
from lteax.phy.fec.viterbi import viterbi_decode_tb, viterbi_decode_tb_batch


def _conv_ref(bits):
    """Serial reference encoder: shift register initialised with last 6 bits."""
    k = len(bits)
    taps = [[(g >> (CONV_K - 1 - j)) & 1 for j in range(CONV_K)] for g in CONV_GEN]
    out = np.zeros((3, k), dtype=np.int32)
    for i in range(k):
        for g in range(3):
            acc = 0
            for j in range(CONV_K):
                acc ^= taps[g][j] * bits[(i - j) % k]
            out[g, i] = acc
    return out


def test_encoder_matches_serial_reference():
    rng = np.random.default_rng(0)
    for k in (40, 70, 120):
        bits = rng.integers(0, 2, size=k).astype(np.int32)
        got = np.asarray(conv_encode(jnp.asarray(bits)))
        np.testing.assert_array_equal(got, _conv_ref(bits))


def test_viterbi_noiseless_roundtrip():
    rng = np.random.default_rng(1)
    for k in (40, 72, 100):
        bits = rng.integers(0, 2, size=k).astype(np.int32)
        d = np.asarray(conv_encode(jnp.asarray(bits))).astype(np.float32)
        llr = 1.0 - 2.0 * d  # perfect LLRs, L = log P0/P1
        dec = np.asarray(viterbi_decode_tb(jnp.asarray(llr), k))
        np.testing.assert_array_equal(dec, bits)


def test_viterbi_noisy():
    """Decodes correctly at moderate SNR (rate-1/3 K=7 is strong)."""
    rng = np.random.default_rng(2)
    k = 40
    n_err = 0
    for trial in range(20):
        bits = rng.integers(0, 2, size=k).astype(np.int32)
        d = np.asarray(conv_encode(jnp.asarray(bits))).astype(np.float32)
        tx = 1.0 - 2.0 * d
        sigma = 0.6  # ~4.4 dB Es/N0
        rx = tx + sigma * rng.standard_normal(tx.shape).astype(np.float32)
        llr = 2.0 * rx / sigma**2
        dec = np.asarray(viterbi_decode_tb(jnp.asarray(llr), k))
        n_err += int((dec != bits).any())
    assert n_err <= 2, f"{n_err}/20 block errors at 4.4 dB"


def test_viterbi_batch():
    rng = np.random.default_rng(3)
    k = 40
    bits = rng.integers(0, 2, size=(8, k)).astype(np.int32)
    d = np.asarray(jnp.stack([conv_encode(jnp.asarray(b)) for b in bits]))
    llr = jnp.asarray((1.0 - 2.0 * d).astype(np.float32))
    dec = np.asarray(viterbi_decode_tb_batch(llr, k))
    np.testing.assert_array_equal(dec, bits)
