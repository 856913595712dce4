"""Channel estimation: noise-variance estimator accuracy, MMSE vs LS under
EVA fading (config #3 gate)."""

import numpy as np
import jax.numpy as jnp

from lteax.phy.config import PhyConfig
from lteax.phy import chest, seq
from lteax.phy.grid import crs_flat_idx, crs_symbols
from lteax.phy.ofdm import subframe_to_samples, samples_to_subframe
from lteax.sim.channel import tap_impulse_response, apply_multipath

CFG = PhyConfig(n_rb_dl=25)
CID, SF = 77, 2


def _crs_grid():
    grid = np.zeros((CFG.n_sym_subframe, CFG.n_sc), dtype=np.complex64)
    flat = grid.reshape(-1)
    vals = []
    for sym in crs_symbols(0, CFG):
        slot = sym // CFG.n_sym_slot
        vals.append(seq.crs_values(CID, 2 * SF + slot, sym % CFG.n_sym_slot,
                                   CFG.n_rb_dl))
    flat[crs_flat_idx(CFG, CID, 0)] = np.concatenate(vals)
    return grid


def test_noise_estimator_unbiased_under_fading():
    rng = np.random.default_rng(1)
    x = np.asarray(subframe_to_samples(jnp.asarray(_crs_grid()), CFG))
    h = tap_impulse_response(rng, "eva", CFG.fs)
    y0 = apply_multipath(x, h)
    nv_true = np.mean(np.abs(y0) ** 2) / 10.0       # 10 dB
    y = y0 + (rng.standard_normal(len(y0)) + 1j * rng.standard_normal(len(y0))
              ).astype(np.complex64) * np.sqrt(nv_true / 2)
    back = samples_to_subframe(jnp.asarray(y), CFG)
    nv_est = float(np.asarray(chest.estimate_noise_var(back, CFG, CID, SF)))
    assert 0.5 < nv_est / nv_true < 2.0, (nv_est, nv_true)


def test_mmse_beats_ls_under_eva():
    rng = np.random.default_rng(0)
    x = np.asarray(subframe_to_samples(jnp.asarray(_crs_grid()), CFG))
    ls_err, mmse_err = [], []
    for _ in range(5):
        h = tap_impulse_response(rng, "eva", CFG.fs)
        y0 = apply_multipath(x, h)
        nv = np.mean(np.abs(y0) ** 2) / 10.0
        y = y0 + (rng.standard_normal(len(y0))
                  + 1j * rng.standard_normal(len(y0))
                  ).astype(np.complex64) * np.sqrt(nv / 2)
        back = samples_to_subframe(jnp.asarray(y), CFG)
        nvest = chest.estimate_noise_var(back, CFG, CID, SF)
        h_ls = np.asarray(chest.estimate_channel(back, CFG, CID, SF, 0))
        h_mmse = np.asarray(chest.estimate_channel_mmse(back, CFG, CID, SF, 0,
                                                        nvest))
        imp = np.zeros(CFG.n_fft, np.complex64)
        imp[:len(h)] = h
        h_true = np.fft.fft(imp)[CFG.sc_to_fft_bin]
        ls_err.append(np.mean(np.abs(h_ls[5] - h_true) ** 2))
        mmse_err.append(np.mean(np.abs(h_mmse[5] - h_true) ** 2))
    assert np.mean(mmse_err) < np.mean(ls_err), (np.mean(mmse_err),
                                                 np.mean(ls_err))


def test_mrc_receive_diversity():
    """equalize_mrc: 2-RX MRC recovers symbols and reports the diversity
    noise gain; combine_sfbc_mrc matches combine_sfbc at n_rx=1 and
    decodes a 2TX x 2RX Alamouti transmission."""
    import numpy as np
    import jax.numpy as jnp
    from lteax.phy import chest
    from lteax.phy.chest import precode_sfbc

    rng = np.random.default_rng(6)
    m = 256
    x = (rng.standard_normal(m) + 1j * rng.standard_normal(m)
         ).astype(np.complex64)
    h = (rng.standard_normal((2, m)) + 1j * rng.standard_normal((2, m))
         ).astype(np.complex64)
    nv = 1e-4
    noise = (rng.standard_normal((2, m)) + 1j * rng.standard_normal((2, m))
             ).astype(np.complex64) * np.sqrt(nv / 2)
    y = h * x[None] + noise
    xh, eff = chest.equalize_mrc(jnp.asarray(y), jnp.asarray(h), nv)
    assert float(jnp.median(jnp.abs(xh - jnp.asarray(x)))) < 0.05
    # diversity: post-combining noise below the better single branch
    eff1 = nv / np.abs(h) ** 2
    assert float(jnp.mean(eff)) < float(np.mean(eff1.min(axis=0)))

    # SFBC over 2 RX
    p0, p1 = precode_sfbc(jnp.asarray(x))
    g0 = (rng.standard_normal((2, m)) + 1j * rng.standard_normal((2, m))
          ).astype(np.complex64)
    g1 = (rng.standard_normal((2, m)) + 1j * rng.standard_normal((2, m))
          ).astype(np.complex64)
    # channel ~constant over RE pairs (SFBC assumption)
    g0 = np.repeat(g0[..., 0::2], 2, axis=-1)
    g1 = np.repeat(g1[..., 0::2], 2, axis=-1)
    y2 = g0 * np.asarray(p0)[None] + g1 * np.asarray(p1)[None] + noise
    xh2, _ = chest.combine_sfbc_mrc(jnp.asarray(y2), jnp.asarray(g0),
                                    jnp.asarray(g1), nv)
    assert float(jnp.median(jnp.abs(xh2 - jnp.asarray(x)))) < 0.05
    # n_rx=1 path equals the plain SFBC combiner
    a, ea = chest.combine_sfbc_mrc(jnp.asarray(y2[:1]), jnp.asarray(g0[:1]),
                                   jnp.asarray(g1[:1]), nv)
    b, eb = chest.combine_sfbc(jnp.asarray(y2[0]), jnp.asarray(g0[0]),
                               jnp.asarray(g1[0]), nv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), rtol=1e-5)
