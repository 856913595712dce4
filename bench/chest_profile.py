"""Micro-profile of the channel-estimation/equalization stage on the chip.

Breaks chest/eq into sub-stages to find where the ~42 us/subframe goes:
pilot gather -> LS -> freq interp matmuls -> time interp -> noise var ->
MMSE equalize -> RE gather.

    python bench/chest_profile.py [--batch 128] [--inner 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from lteax.phy.config import PhyConfig
    from lteax.phy import chest
    from lteax.phy.grid import pdsch_flat_idx, crs_flat_idx, crs_symbols, _crs_v
    from lteax.phy.chest import (_crs_ref_values, _freq_interp_matrix,
                                 _time_interp_matrix)

    cfg = PhyConfig(n_rb_dl=100)
    cid, sf, cfi = 214, 1, 1
    prbs = tuple(range(100))
    re_idx = np.asarray(pdsch_flat_idx(cfg, cid, cfi, prbs, sf))
    rng = np.random.default_rng(0)
    grid = (rng.standard_normal((a.batch, cfg.n_sym_subframe, cfg.n_sc, 2))
            .astype(np.float32))
    gd = jax.device_put(jnp.asarray(grid[..., 0] + 1j * grid[..., 1],
                                    dtype=jnp.complex64))

    syms = crs_symbols(0, cfg)
    pidx = np.asarray(crs_flat_idx(cfg, cid, 0).reshape(len(syms),
                                                        2 * cfg.n_rb_dl))
    ref = np.asarray(_crs_ref_values(cfg, cid, 0, sf))
    vs = cid % 6

    def pilots(g):
        flat = g.reshape(*g.shape[:-2], -1)
        return flat[..., pidx]

    def ls(g):
        return pilots(g) * jnp.conj(ref)

    def finterp(g):
        h_ls = ls(g)
        cols = []
        for i, sym in enumerate(syms):
            slot = sym // cfg.n_sym_slot
            l = sym % cfg.n_sym_slot
            shift = (_crs_v(0, l, slot) + vs) % 6
            w = jnp.asarray(_freq_interp_matrix(cfg, shift))
            cols.append(h_ls[..., i, :] @ w.T.astype(jnp.complex64))
        return jnp.stack(cols, axis=-2)

    def tinterp(g):
        h_f = finterp(g)
        wt = jnp.asarray(_time_interp_matrix(cfg, syms)).astype(jnp.complex64)
        return jnp.einsum("sp,...pk->...sk", wt, h_f)

    def nv_est(g):
        return chest.estimate_noise_var(g, cfg, cid, sf)

    def eq_full(g):
        h = tinterp(g)
        nv = nv_est(g)
        x_eq, eff = chest.equalize_siso(
            g.reshape(*g.shape[:-2], -1), h.reshape(*h.shape[:-2], -1),
            nv[..., None])
        return x_eq[..., re_idx].real.sum() + eff[..., re_idx].sum()

    stages = {
        "pilot gather": lambda g: pilots(g).real.sum(),
        "+LS": lambda g: ls(g).real.sum(),
        "+freq interp": lambda g: finterp(g).real.sum(),
        "+time interp": lambda g: tinterp(g).real.sum(),
        "noise var (alone)": lambda g: nv_est(g).sum(),
        "full eq chain": eq_full,
    }
    for name, fn in stages.items():
        def run(g, fn=fn):
            def body(i, acc):
                return acc + fn(g + 0.0 * acc.astype(g.dtype))
            return jax.lax.fori_loop(0, a.inner, body, jnp.float32(0.0))
        f = jax.jit(run)
        np.asarray(f(gd))  # transfer = reliable completion barrier (PERF.md)
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(f(gd))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) / a.inner * 1e3
        print(f"{name:20s} {t:8.2f} ms/batch({a.batch})")


if __name__ == "__main__":
    main()
