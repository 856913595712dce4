"""OFDM demod DFT formulation probe (r5 session 2).

Times samples_to_subframe variants at the headline B on the chip:
  fft        — XLA FFT (production default pre-probe)
  fac_bm     — factored, w2 @ v broadcast form (32k tiny batched matmuls)
  fac_es     — factored, dim(-2) einsum contractions (flattened big-M dots)
  fac_4step  — factored, explicit mid-transpose + last-axis matmuls

Usage: python bench/ofdm_probe.py [--batch 2304] [--reps 7]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2304)
    ap.add_argument("--reps", type=int, default=7)
    a = ap.parse_args()
    from lteax.phy.config import PhyConfig
    from lteax.phy.dft import _consts
    from lteax.phy.ofdm import samples_to_subframe

    cfg = PhyConfig(n_rb_dl=100)
    n = cfg.n_fft
    n1, n2, w1, w2, tw = _consts(n, False)
    bins = np.asarray(cfg.sc_to_fft_bin)
    bmap = jnp.asarray(((bins % n2) * n1 + bins // n2).astype(np.int32))

    rng = np.random.default_rng(0)
    # float IQ pairs: the axon backend rejects complex transfers
    xp = rng.standard_normal(
        (a.batch, cfg.n_samps_subframe, 2)).astype(np.float32)
    xd = jax.device_put(jnp.asarray(xp))

    def to_c(p):
        return (p[..., 0] + 1j * p[..., 1]).astype(jnp.complex64)

    scale = np.float32(1 / np.sqrt(n))

    def blocks_of(s):
        return jnp.stack(
            [jax.lax.slice_in_dim(s, st, st + cfg.n_fft, axis=-1)
             for st in cfg.symbol_starts_subframe], axis=-2)

    def f_fft(s):
        return samples_to_subframe(s, cfg, dft="fft")

    def f_bm(s):
        return samples_to_subframe(s, cfg, dft="factored")

    w1r, w1i = np.real(w1), np.imag(w1)
    w2r, w2i = np.real(w2), np.imag(w2)
    twr, twi = np.real(tw), np.imag(tw)

    def f_es(s):
        """dim(-2) contractions expressed as einsums with no batch dims:
        free dims flatten into one big M."""
        b = blocks_of(s)
        lead = b.shape[:-1]
        v = b.reshape(*lead, n2, n1)
        vr, vi = jnp.real(v), jnp.imag(v)
        # stage A: contract n2 (dim -2): out (..., n1, k2)
        ar = (jnp.einsum("...mn,mk->...nk", vr, w2r)
              - jnp.einsum("...mn,mk->...nk", vi, w2i))
        ai = (jnp.einsum("...mn,mk->...nk", vr, w2i)
              + jnp.einsum("...mn,mk->...nk", vi, w2r))
        # twiddle (n1, k2) = tw.T
        t_r, t_i = twr.T, twi.T
        br_ = ar * t_r - ai * t_i
        bi_ = ar * t_i + ai * t_r
        # stage B: contract n1 (dim -2): out (..., k2, k1)
        cr = (jnp.einsum("...nk,nj->...kj", br_, w1r)
              - jnp.einsum("...nk,nj->...kj", bi_, w1i))
        ci = (jnp.einsum("...nk,nj->...kj", br_, w1i)
              + jnp.einsum("...nk,nj->...kj", bi_, w1r))
        c = (cr + 1j * ci).astype(jnp.complex64)
        return c.reshape(*lead, n)[..., bmap] * scale

    def f_4step(s):
        """Explicit mid-transposes; both matmuls contract the LAST axis
        with flattened big M."""
        b = blocks_of(s)
        lead = b.shape[:-1]
        v = b.reshape(*lead, n2, n1)
        vt = jnp.swapaxes(v, -1, -2)         # (..., n1, n2)  [relayout]
        vr, vi = jnp.real(vt), jnp.imag(vt)
        # stage A: DFT over n2 (last): out (..., n1, k2)
        ar = jnp.matmul(vr, w2r) - jnp.matmul(vi, w2i)
        ai = jnp.matmul(vr, w2i) + jnp.matmul(vi, w2r)
        t_r, t_i = twr.T, twi.T              # (n1, k2)
        br_ = ar * t_r - ai * t_i
        bi_ = ar * t_i + ai * t_r
        bt_r = jnp.swapaxes(br_, -1, -2)     # (..., k2, n1) [relayout]
        bt_i = jnp.swapaxes(bi_, -1, -2)
        # stage B: DFT over n1 (last): out (..., k2, k1)
        cr = jnp.matmul(bt_r, w1r) - jnp.matmul(bt_i, w1i)
        ci = jnp.matmul(bt_r, w1i) + jnp.matmul(bt_i, w1r)
        c = (cr + 1j * ci).astype(jnp.complex64)
        return c.reshape(*lead, n)[..., bmap] * scale

    from lteax.phy.ofdm import _symbol_sample_gather, _ofdm_dft_factored
    sym_idx = jnp.asarray(_symbol_sample_gather(cfg))

    def f_bm_gather(s):
        """factored DFT, but symbol blocks cut with ONE gather instead of
        the 14 slice+stack copies (~5 ms/batch of copy.7x in the r5
        session-2 trace)."""
        return _ofdm_dft_factored(s[..., sym_idx], cfg)

    ref = None
    for name, fn in [("fft", f_fft), ("fac_bm", f_bm), ("fac_es", f_es),
                     ("fac_4step", f_4step), ("fac_gather", f_bm_gather)]:
        # complex outputs can't transfer on this backend: return IQ pairs
        j = jax.jit(lambda s, fn=fn: jnp.stack(
            [jnp.real(fn(to_c(s))), jnp.imag(fn(to_c(s)))], axis=-1))
        y = np.asarray(j(xd)[:4])
        if ref is None:
            ref = y
        else:
            err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
            print(f"  {name}: max rel err vs fft = {err:.2e}",
                  file=sys.stderr)
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(j(xd)[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        print(f"{name:10s}  {np.median(ts)*1e3:8.2f} ms  "
              f"(min {min(ts)*1e3:.2f})")


if __name__ == "__main__":
    main()
