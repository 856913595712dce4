"""Turbo-stage cost breakdown at the headline config.

Separates the Pallas half-iteration kernel cost from the inter-iteration
glue (extrinsic arithmetic, QPP gathers, early-stop CRC matmul, final
desegment+CRC24A) by timing jit programs that run cumulative pieces, on
real decodable LLRs (so the early stop behaves as in production).

Usage: python bench/turbo_breakdown.py [--batch 384] [--reps 7]
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
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--reps", type=int, default=7)
    a = ap.parse_args()

    from bench.frontend_breakdown import build_inputs
    from lteax.phy.config import PhyConfig
    from lteax.phy import chest, seq
    from lteax.phy.grid import pdsch_flat_idx, make_flat_extractor
    from lteax.phy.ofdm import samples_to_subframe
    from lteax.phy.mod import demodulate_maxlog
    from lteax.phy.channels import pdsch as pdsch_mod
    from lteax.phy.channels.pdsch import _c_init, soft_dematch
    from lteax.phy.tables.tbs import get_tbs_for_mcs
    from lteax.phy.fec.crc import check_crc
    from lteax.io.iq import to_iq_f32
    from lteax.kernels.turbo_mlm import (turbo_decode_batch_pallas,
                                         half_iteration_pallas,
                                         _pin_boundaries)

    cfg = PhyConfig(n_rb_dl=100)
    cid, sf, rnti, mcs, cfi = 214, 1, 0x1234, 28, 1
    prbs = tuple(range(100))
    tbs, scheme = get_tbs_for_mcs(mcs, 100)
    re_idx = pdsch_flat_idx(cfg, cid, cfi, prbs, sf)
    geom = pdsch_mod.pdsch_geometry(tbs, len(re_idx), 6, 0)
    extract, _, _ = make_flat_extractor(re_idx, cfg.n_sym_subframe, cfg.n_sc)
    sgn = jnp.asarray(seq.scrambling_symbols_np(_c_init(rnti, sf, cid), geom.g))
    k = geom.k
    d_len = k + 4

    print(f"building {a.batch} subframes...", file=sys.stderr)
    x = build_inputs(cfg, cid, sf, rnti, cfi, prbs, geom, scheme, a.batch, tbs)
    xd = jax.device_put(jnp.asarray(to_iq_f32(x)))

    def stage_front(s_iq):
        def one(samples):
            grid = samples_to_subframe(samples, cfg)
            h = chest.estimate_channel(grid, cfg, cid, sf, port=0)
            nv = chest.estimate_noise_var(grid, cfg, cid, sf)
            x_eq, eff_nv = chest.equalize_siso(grid.reshape(-1), h.reshape(-1), nv)
            llr = demodulate_maxlog(extract(x_eq), scheme, extract(eff_nv))
            return llr * sgn
        llr = jax.vmap(one)(s_iq[..., 0].astype(jnp.float32)
                            + 1j * s_iq[..., 1].astype(jnp.float32)
                            ).astype(jnp.bfloat16)
        return soft_dematch(llr, geom)

    d_llr = jax.jit(stage_front)(xd)
    d_llr = jax.device_put(np.asarray(d_llr))   # settle as a concrete input
    flat_shape = (a.batch * geom.info.c, 3, d_len)

    win, acq, tbk = 128, 16, 16
    n = k + 3
    n_w = -(-n // win)
    gb = max(1, min(128 // n_w, a.batch * geom.info.c))

    def t_kernel_only(d):
        """4 chained half-iteration kernel calls, minimal glue (no QPP, no
        extrinsic arithmetic): measures the raw kernel cost of 2 iterations."""
        flat = d.reshape(flat_shape)
        u = flat[:, 0, :k + 3].astype(jnp.bfloat16)
        v = flat[:, 1, :k + 3].astype(jnp.bfloat16)
        c = flat.shape[0]
        zero = jnp.zeros((c, n_w, 8), jnp.float32)
        a0, b0 = _pin_boundaries(zero, zero)

        def body(carry, _):
            u_c, a_c, b_c = carry
            l, a_n, b_n = half_iteration_pallas(u_c, v, a_c, b_c, win, acq, n,
                                                tb=tbk, gb=gb, mdtype="bf16",
                                                fused=True)
            return (l.astype(jnp.bfloat16), a_n, b_n), None
        (l, _, _), _ = jax.lax.scan(body, (u, a0, b0), None, length=4)
        return jnp.sum(l.astype(jnp.float32), axis=-1)

    def t_fixed(n_iter, early):
        def f(d):
            flat = d.reshape(flat_shape)
            bits = turbo_decode_batch_pallas(
                flat, k, n_iter=n_iter, tb=tbk, win=win, acq=acq,
                early_crc=("24B" if early else None), mdtype="bf16")
            return jnp.sum(bits, axis=-1)
        return f

    def t_full(d):
        flat = d.reshape(flat_shape)
        bits = turbo_decode_batch_pallas(flat, k, n_iter=6, tb=tbk, win=win,
                                         acq=acq, early_crc="24B",
                                         mdtype="bf16")
        bits = bits.reshape(a.batch, geom.info.c, k)
        payload, cb_ok = check_crc(bits, "24B")
        tb_full = pdsch_mod.desegment_device(payload, geom.info)
        tb_bits, ok = check_crc(tb_full, "24A")
        return ok & jnp.all(cb_ok, axis=-1)

    progs = [
        ("4x kernel only (2 iters, no glue)", t_kernel_only),
        ("fixed 2 iters, full glue, no CRC stop", t_fixed(2, False)),
        ("2 iters w/ per-iter CRC check (early on)", t_fixed(2, True)),
        ("early-stop 6max (production, ~2 iters)", t_fixed(6, True)),
        ("+ desegment + CRC24B/A (full stage)", t_full),
    ]

    for name, fn in progs:
        f = jax.jit(fn)
        out = np.asarray(f(d_llr))
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            np.asarray(f(d_llr))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) * 1e3
        print(f"{name:44s} {med:8.2f} ms", file=sys.stderr)
    print("(subtract the ~29.5 ms fixed dispatch overhead from each; "
          "see bench/frontend_breakdown.py's input-read baseline)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
