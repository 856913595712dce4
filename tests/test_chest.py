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
