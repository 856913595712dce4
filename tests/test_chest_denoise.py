"""Unit tests for the UL delay-domain chest denoiser and the host-Wiener
CRS interpolator (the two round-2 chest additions)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lteax.phy.channels.pusch import chest_denoise, chest_taps
from lteax.phy import chest
from lteax.phy.config import PhyConfig


def test_chest_denoise_reduces_noise_flat_channel():
    rng = np.random.default_rng(0)
    m_sc = 1200
    h_true = np.ones(m_sc, np.complex64)
    nv = 1e-2
    noise = (rng.standard_normal(m_sc)
             + 1j * rng.standard_normal(m_sc)).astype(np.complex64) \
        * np.sqrt(nv / 2)
    h_ls = h_true + noise
    h_dn = np.asarray(chest_denoise(jnp.asarray(h_ls)))
    err_raw = np.mean(np.abs(h_ls - h_true) ** 2)
    err_dn = np.mean(np.abs(h_dn - h_true) ** 2)
    # keep-fraction ~ (86+9)/1200 -> ~11 dB noise cut; require >= 8 dB
    assert err_dn < err_raw / 6.3, (err_raw, err_dn)


def test_chest_denoise_no_bias_for_cp_span_channel():
    """A frequency-selective channel whose delay spread fits the CP must
    pass through (denoising removes noise, not channel)."""
    rng = np.random.default_rng(1)
    m_sc = 600
    taps = np.zeros(m_sc, np.complex64)
    n_keep = int(np.ceil(m_sc * 144 / 2048))       # CP span
    for d in (0, 3, n_keep - 1):
        taps[d] = rng.standard_normal() + 1j * rng.standard_normal()
    h_true = np.fft.fft(taps)
    h_dn = np.asarray(chest_denoise(jnp.asarray(h_true.astype(np.complex64))))
    np.testing.assert_allclose(h_dn, h_true, rtol=0, atol=1e-3)


def test_chest_taps_mask_shape():
    m = chest_taps(72)
    assert m.shape == (72,) and m[0] == 1 and m[-1] == 1
    assert 0 < m.sum() < 72


def test_wiener_static_matches_solve_path():
    """Host-precomputed Wiener matrix (static nv) == on-device solve
    (traced nv) on CPU, where the solve is accurate."""
    rng = np.random.default_rng(2)
    cfg = PhyConfig(n_rb_dl=25)
    cid, sf, port, nv = 214, 3, 0, 1e-2
    grid = (rng.standard_normal((cfg.n_sym_subframe, cfg.n_sc))
            + 1j * rng.standard_normal((cfg.n_sym_subframe, cfg.n_sc))
            ).astype(np.complex64)
    g = jnp.asarray(grid)
    h_static = np.asarray(chest.estimate_channel_mmse(
        g, cfg, cid, sf, port=port, noise_var=nv))
    h_solve = np.asarray(chest.estimate_channel_mmse(
        g, cfg, cid, sf, port=port, noise_var=jnp.float32(nv)))
    np.testing.assert_allclose(h_static, h_solve, rtol=0, atol=2e-4)
