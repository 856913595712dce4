"""CRC per 36.212 §5.1.1 — spec-derived vectors + linearity/systematic checks."""

import numpy as np
import jax.numpy as jnp

from lteax.phy.fec import crc as crc_mod


def _crc_ref(bits, kind):
    """Straightforward serial LFSR reference (independent implementation)."""
    L, poly = crc_mod.CRC_POLYS[kind]
    reg = 0
    for b in bits:
        reg = (reg << 1) | int(b)
        if reg >> L:
            reg = (reg & ((1 << L) - 1)) ^ poly
    # flush L zeros
    for _ in range(L):
        reg <<= 1
        if reg >> L:
            reg = (reg & ((1 << L) - 1)) ^ poly
    return np.array([(reg >> (L - 1 - j)) & 1 for j in range(L)], dtype=np.int32)


def test_crc_matches_serial_reference():
    rng = np.random.default_rng(0)
    for kind in ("24A", "24B", "16", "8"):
        for n in (24, 40, 131, 1000):
            bits = rng.integers(0, 2, size=n).astype(np.int32)
            got = np.asarray(crc_mod.crc(jnp.asarray(bits), kind))
            ref = _crc_ref(bits, kind)
            np.testing.assert_array_equal(got, ref, err_msg=f"{kind} n={n}")


def test_attach_check_roundtrip():
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, size=(5, 64)).astype(np.int32))
    for kind in ("24A", "16"):
        coded = crc_mod.attach_crc(bits, kind)
        payload, ok = crc_mod.check_crc(coded, kind)
        assert bool(jnp.all(ok))
        np.testing.assert_array_equal(np.asarray(payload), np.asarray(bits))
        # flip a bit -> fail
        bad = coded.at[0, 3].set(1 - coded[0, 3])
        _, ok2 = crc_mod.check_crc(bad, kind)
        assert not bool(ok2[0]) and bool(jnp.all(ok2[1:]))


def test_crc_mask():
    """PBCH-style antenna-mask CRC (36.212 §5.3.1.1)."""
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, size=24).astype(np.int32))
    mask = np.ones(16, dtype=np.int32)  # 2-antenna mask: all ones
    coded = crc_mod.attach_crc(bits, "16", mask_bits=mask)
    _, ok_with = crc_mod.check_crc(coded, "16", mask_bits=mask)
    _, ok_without = crc_mod.check_crc(coded, "16")
    assert bool(ok_with) and not bool(ok_without)
