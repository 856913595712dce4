"""Pallas turbo kernel vs XLA reference decoder (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lteax.phy.fec.turbo import turbo_encode_batch, turbo_decode_batch
from lteax.kernels.turbo_mlm import turbo_decode_batch_pallas


@pytest.mark.parametrize(
    "k", [40, 232, pytest.param(1024, marks=pytest.mark.mid)])
def test_pallas_matches_xla_noisy(k):
    rng = np.random.default_rng(0)
    c = 4
    bits = rng.integers(0, 2, size=(c, k)).astype(np.int32)
    d = np.asarray(turbo_encode_batch(jnp.asarray(bits), k)).astype(np.float32)
    sigma = 0.65
    rx = (1.0 - 2.0 * d) + sigma * rng.standard_normal(d.shape).astype(np.float32)
    llr = jnp.asarray(2.0 * rx / sigma**2)
    ref = np.asarray(turbo_decode_batch(llr, k, n_iter=4))
    got = np.asarray(turbo_decode_batch_pallas(llr, k, n_iter=4, tb=2,
                                               interpret=True))
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(ref, bits)  # and both are correct


def test_pallas_high_rate():
    from lteax.phy.fec.ratematch import turbo_rm_indices, rate_match, rate_unmatch
    rng = np.random.default_rng(3)
    k = 1056
    e_len = int(k / 0.85)
    idx = turbo_rm_indices(k + 4, e_len, rv=0)
    bits = rng.integers(0, 2, size=(2, k)).astype(np.int32)
    d = turbo_encode_batch(jnp.asarray(bits), k)
    e = np.asarray(rate_match(d, idx)).astype(np.float32)
    sigma = float(np.sqrt(1.0 / (2 * 10 ** (2.0))))  # 20 dB
    rx = (1.0 - 2.0 * e) + sigma * rng.standard_normal(e.shape).astype(np.float32)
    llr = rate_unmatch(jnp.asarray(2.0 * rx / sigma**2), idx, k + 4)
    got = np.asarray(turbo_decode_batch_pallas(llr, k, n_iter=6, tb=2,
                                               interpret=True))
    np.testing.assert_array_equal(got, bits)


@pytest.mark.parametrize(
    "gb", [2, pytest.param(4, marks=pytest.mark.mid)])
def test_lane_fold_invariance(gb):
    """gb>1 folds codeblocks into the lane axis; output must be identical
    to gb=1 (windows of different blocks are independent chains)."""
    rng = np.random.default_rng(7)
    k, c = 496, 6          # n_w=4 at win=128 -> gb up to 32; c%gb != 0 for gb=4
    bits = rng.integers(0, 2, size=(c, k)).astype(np.int32)
    d = np.asarray(turbo_encode_batch(jnp.asarray(bits), k)).astype(np.float32)
    sigma = 0.7
    rx = (1.0 - 2.0 * d) + sigma * rng.standard_normal(d.shape).astype(np.float32)
    llr = jnp.asarray(2.0 * rx / sigma**2)
    ref = np.asarray(turbo_decode_batch_pallas(llr, k, n_iter=4, tb=2, gb=1,
                                               interpret=True))
    got = np.asarray(turbo_decode_batch_pallas(llr, k, n_iter=4, tb=2, gb=gb,
                                               interpret=True))
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(ref, bits)


def test_early_crc_termination():
    """early_crc stopping returns CRC-valid bits (identical payloads) and
    degrades to the full-iteration decode on garbage input."""
    from lteax.phy.fec.crc import attach_crc, check_crc
    rng = np.random.default_rng(11)
    k, c = 232, 4
    payload = rng.integers(0, 2, size=(c, k - 24)).astype(np.int32)
    bits = np.asarray(attach_crc(jnp.asarray(payload), "24B"))
    d = np.asarray(turbo_encode_batch(jnp.asarray(bits), k)).astype(np.float32)
    sigma = 0.6
    rx = (1.0 - 2.0 * d) + sigma * rng.standard_normal(d.shape).astype(np.float32)
    llr = jnp.asarray(2.0 * rx / sigma**2)
    got = np.asarray(turbo_decode_batch_pallas(llr, k, n_iter=6, tb=2,
                                               early_crc="24B",
                                               interpret=True))
    pay, ok = check_crc(jnp.asarray(got), "24B")
    assert np.all(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(pay), payload)
    # garbage input: must not hang/crash, CRC simply fails
    garbage = jnp.asarray(rng.standard_normal(llr.shape).astype(np.float32))
    got2 = turbo_decode_batch_pallas(garbage, k, n_iter=2, tb=2,
                                     early_crc="24B", interpret=True)
    _, ok2 = check_crc(got2, "24B")
    assert not np.all(np.asarray(ok2))


@pytest.mark.mid
def test_pallas_bf16_decodes():
    """bf16 trellis path (with per-block renormalisation) decodes cleanly at
    bench-scale LLR magnitudes.  Interpret mode exercises wiring + renorm
    algebra (the real accumulation-precision behaviour was validated on
    hardware: 384/384 CRC at 25 dB, ~0.1 dB threshold cost — PERF.md)."""
    rng = np.random.default_rng(7)
    k, c = 1024, 4
    bits = rng.integers(0, 2, size=(c, k)).astype(np.int32)
    d = np.asarray(turbo_encode_batch(jnp.asarray(bits), k)).astype(np.float32)
    sigma = 0.65
    rx = (1.0 - 2.0 * d) + sigma * rng.standard_normal(d.shape).astype(np.float32)
    llr = jnp.asarray(500.0 * 2.0 * rx / sigma**2)   # bench-scale magnitudes
    got = np.asarray(turbo_decode_batch_pallas(llr, k, n_iter=4, tb=2,
                                               mdtype="bf16", interpret=True))
    np.testing.assert_array_equal(got, bits)


@pytest.mark.parametrize("k", [40, 1024, 5824])
def test_fused_combine_matches_unfused(k):
    # fused second-half combine consumes the same (alpha, gamma, beta)
    # triples as the unfused kernel: NII exports bit-identical; L equal up
    # to one f32 rounding (the combine hoists gamma out of the branch max),
    # hard decisions identical
    from lteax.kernels.turbo_mlm import half_iteration_pallas, _pin_boundaries
    rng = np.random.default_rng(7)
    bsz, n = 5, k + 3
    win, acq = 128, 16
    n_w = -(-n // win)
    u = jnp.asarray(rng.standard_normal((bsz, n)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bsz, n)).astype(np.float32))
    a0, b0 = _pin_boundaries(jnp.zeros((bsz, n_w, 8), jnp.float32),
                             jnp.zeros((bsz, n_w, 8), jnp.float32))
    # nofreeze=False: the exact-carry configuration is the one comparable
    # to the unfused reference kernel
    ref = half_iteration_pallas(u, v, a0, b0, win, acq, n, tb=5,
                                fused=False, interpret=True)
    got = half_iteration_pallas(u, v, a0, b0, win, acq, n, tb=5,
                                fused=True, nofreeze=False, interpret=True)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                               rtol=0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref[0]) < 0,
                                  np.asarray(got[0]) < 0)
    for r, g in zip(ref[1:], got[1:]):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


@pytest.mark.mid
def test_fused_decode_bf16():
    rng = np.random.default_rng(8)
    k, c = 5824, 3
    bits = rng.integers(0, 2, size=(c, k)).astype(np.int32)
    d = np.asarray(turbo_encode_batch(jnp.asarray(bits), k)).astype(np.float32)
    sigma = 0.6
    rx = (1.0 - 2.0 * d) + sigma * rng.standard_normal(d.shape).astype(np.float32)
    llr = jnp.asarray(2.0 * rx / sigma**2)
    got = np.asarray(turbo_decode_batch_pallas(llr, k, n_iter=4, tb=3,
                                               acq=16, mdtype="bf16",
                                               fused=True, interpret=True))
    np.testing.assert_array_equal(got, bits)


@pytest.mark.heavy
@pytest.mark.parametrize("mdtype", ["f32", "bf16"])
def test_pinpad_matches_masked(mdtype):
    """Pinned padding (u=+PIN on dead positions, maskless kernel) must make
    the same hard decisions as the freeze-masked kernel."""
    rng = np.random.default_rng(11)
    for k in (40, 1024, 5824):
        c = 3
        bits = rng.integers(0, 2, size=(c, k)).astype(np.int32)
        d = np.asarray(turbo_encode_batch(jnp.asarray(bits), k)
                       ).astype(np.float32)
        sigma = 0.65
        rx = ((1.0 - 2.0 * d)
              + sigma * rng.standard_normal(d.shape).astype(np.float32))
        llr = jnp.asarray(2.0 * rx / sigma**2)
        ref = np.asarray(turbo_decode_batch_pallas(
            llr, k, n_iter=4, tb=2, fused=True, mdtype=mdtype,
            interpret=True))
        got = np.asarray(turbo_decode_batch_pallas(
            llr, k, n_iter=4, tb=2, fused=True, pinpad=True, mdtype=mdtype,
            interpret=True))
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got, bits)
