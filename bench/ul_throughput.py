"""UL-SCH (PUSCH) decode throughput on one chip.

Full SC-FDMA receive chain: DM-RS LS chest + MMSE eq + IDFT de-precoding +
max-log demap + channel de-interleave + descramble + de-match + Pallas
turbo + CRC.  20 MHz (100 PRB), TBS 75376, 64QAM.

    python bench/ul_throughput.py [--batch 64] [--reps 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from lteax.phy.channels import pusch
    from lteax.phy.channels.pdsch import (pdsch_prepare_cbs, _c_init,
                                          soft_dematch)
    from lteax.phy import seq
    from lteax.phy.mod import demodulate_maxlog
    from lteax.phy.fec.crc import check_crc
    from lteax.phy.channels.pdsch import desegment_device
    from lteax.kernels.turbo_mlm import turbo_decode_batch_pallas
    from lteax.phy.channels.pusch import (DMRS_SYMS, N_DATA_SYMS,
                                          channel_interleaver_idx, _inv,
                                          dmrs_pusch)

    cid, sf, rnti = 214, 4, 0x3D
    alloc = pusch.PuschAlloc(n_prb=100, rb_start=0, mcs_tbs=75376, qm=6)
    geom = alloc.geom
    rng = np.random.default_rng(0)
    b = a.batch
    nv = 10 ** (-2.5)

    # build inputs on CPU
    cpu = jax.devices("cpu")[0] if not a.cpu else jax.devices()[0]
    with jax.default_device(cpu):
        b_uniq = min(b, 16)
        tbs_bits = rng.integers(0, 2, size=(b_uniq, alloc.mcs_tbs)).astype(np.int32)
        grids = []
        for i in range(b_uniq):
            cbs = jnp.asarray(pdsch_prepare_cbs(tbs_bits[i], geom))
            g = pusch.pusch_encode_cbs(cbs, alloc, rnti, sf, cid)
            grids.append(pusch.pusch_add_dmrs(np.asarray(g), alloc, cid, sf))
        x = np.stack(grids)
    reps_t = b // b_uniq + (1 if b % b_uniq else 0)
    x = np.tile(x, (reps_t, 1, 1))[:b]
    tbs_bits = np.tile(tbs_bits, (reps_t, 1))[:b]
    x = x + (rng.standard_normal(x.shape)
             + 1j * rng.standard_normal(x.shape)) * np.sqrt(nv / 2)
    x_iq = np.stack([x.real, x.imag], -1).astype(np.float32)

    m_sc = alloc.m_sc
    data_syms = [s for s in range(14) if s not in DMRS_SYMS]
    # closure constants MUST stay numpy: device-resident complex constants
    # cannot be fetched for IR embedding on this backend
    ref0 = np.conj(dmrs_pusch(cid, 2 * sf, m_sc))
    ref1 = np.conj(dmrs_pusch(cid, 2 * sf + 1, m_sc))
    inv = _inv((geom.g, alloc.qm))
    w = np.clip(np.asarray([(s - DMRS_SYMS[0]) / (DMRS_SYMS[1] - DMRS_SYMS[0])
                            for s in data_syms], dtype=np.float32),
                0.0, 1.0)[:, None]

    def front(g_iq):
        grid = (g_iq[..., 0] + 1j * g_iq[..., 1]).astype(jnp.complex64)
        h0 = grid[DMRS_SYMS[0]] * ref0
        h1 = grid[DMRS_SYMS[1]] * ref1
        h = (1 - w) * h0[None] + w * h1[None]
        y = grid[jnp.asarray(data_syms)]
        p = jnp.abs(h) ** 2
        xf = y * jnp.conj(h) / (p + nv)
        xf = xf / jnp.maximum(p / (p + nv), 1e-12)
        xt = jnp.fft.ifft(xf, axis=-1) * np.sqrt(m_sc)
        eff = jnp.mean(nv / jnp.maximum(p, 1e-12), axis=-1, keepdims=True) \
            * jnp.ones_like(p)
        llr = demodulate_maxlog(xt.reshape(-1), alloc.scheme, eff.reshape(-1))
        c = seq.gold_sequence(_c_init(rnti, sf, cid), geom.g)
        llr = llr * (1.0 - 2.0 * c).astype(llr.dtype)
        if os.environ.get("LTEAX_PALLAS_DTYPE", "bf16").startswith("bf16"):
            llr = llr.astype(jnp.bfloat16)  # trellis dtype from here on
        # channel DE-interleaver (36.212 §5.2.2.8 data-only) is a pure
        # rectangular transpose: (C_mux=12 symbols, R_mux, Qm) -> row-major
        r_mux = geom.g // (12 * alloc.qm)
        llr = llr.reshape(12, r_mux, alloc.qm).transpose(1, 0, 2).reshape(-1)
        return soft_dematch(llr, geom)

    win = int(os.environ.get("LTEAX_PALLAS_WIN", "128"))
    acq = int(os.environ.get("LTEAX_PALLAS_ACQ", "16"))
    tbt = int(os.environ.get("LTEAX_PALLAS_TB", "16"))

    def stage1(batch_iq):
        return jax.vmap(front)(batch_iq)

    def stage2(d_llr):
        flat = d_llr.reshape(-1, 3, geom.k + 4)
        bits = turbo_decode_batch_pallas(flat, geom.k, n_iter=a.iters,
                                         win=win, acq=acq, tb=tbt,
                                         mdtype=os.environ.get(
                                             "LTEAX_PALLAS_DTYPE", "bf16"),
                                         early_crc="24B", interpret=a.cpu)
        bits = bits.reshape(b, geom.info.c, geom.k)
        payload, cb_ok = check_crc(bits, "24B")
        tb_full = desegment_device(payload, geom.info)
        tb, ok = check_crc(tb_full, "24A")
        return tb, ok & jnp.all(cb_ok, axis=-1)

    # two programs (see shard/pipeline.py: less fusion pressure, and the
    # Pallas kernel must not share a program with big slice/concat graphs
    # on this backend)
    f1, f2 = jax.jit(stage1), jax.jit(stage2)
    f = lambda x: f2(f1(x))
    # stage the input on device once (same protocol as bench.py: the
    # measured quantity is decode compute, not tunnel transfer; streaming
    # apps overlap transfers via io.prefetch_to_device)
    xd = jax.device_put(jnp.asarray(x_iq))
    out = f(xd)
    jax.block_until_ready(out)
    n_ok = int(np.sum(np.asarray(out[1])))
    print(f"warmup done, crc ok {n_ok}/{b}", file=sys.stderr)
    ts = []
    for _ in range(a.reps):
        t0 = time.perf_counter()
        out = f(xd)
        np.asarray(out[1])  # transfer = reliable completion barrier
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"per-batch median {t*1e3:.1f} ms / {b} subframes", file=sys.stderr)
    # sustained: 2 batches in flight (host dispatch overlaps device exec,
    # as the streaming apps drive it) — same work, same barrier
    inflight = []
    t0 = time.perf_counter()
    for _ in range(a.reps):
        inflight.append(f(xd))
        if len(inflight) > 2:
            np.asarray(inflight.pop(0)[1])
    for r in inflight:
        np.asarray(r[1])
    t_sus = (time.perf_counter() - t0) / a.reps
    print(f"sustained (2 in flight): {t_sus*1e3:.1f} ms/batch", file=sys.stderr)
    t = min(t, t_sus)
    mbps = b * alloc.mcs_tbs / t / 1e6
    print(json.dumps({"metric": "decoded UL-SCH throughput, 20 MHz 64QAM TBS 75376",
                      "value": round(mbps, 2), "unit": "Mbit/s/chip",
                      "crc_ok": n_ok, "batch": b}))


if __name__ == "__main__":
    main()
