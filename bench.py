"""Headline benchmark: decoded DL-SCH Mbit/s per chip at 20 MHz.

Runs the full PDSCH receive chain (OFDM demod -> CRS channel estimation ->
MMSE equalization -> max-log 64QAM demap -> descramble -> rate de-match ->
6-iteration windowed max-log-MAP turbo decode -> CRC24B/A) on batches of
20 MHz subframes carrying TBS-75376 transport blocks (MCS 28, 100 PRB) —
the reference's maximum single-codeword DL-SCH rate.

Baseline: the reference's implicit real-time contract is 1 ms of processing
per 1 ms subframe, i.e. 75.376 Mbit/s at this configuration (BASELINE.md).
``vs_baseline`` = decoded Mbit/s / 75.376.

Prints ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    try:  # persistent compile cache (first compile on this backend is slow)
        jax.config.update("jax_compilation_cache_dir", "/tmp/lteax_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    from lteax.phy.config import PhyConfig
    from lteax.phy import seq
    from lteax.phy.grid import crs_flat_idx, crs_symbols, pdsch_flat_idx
    from lteax.phy.ofdm import subframe_to_samples
    from lteax.phy.channels import pdsch as pdsch_mod
    from lteax.phy.tables.tbs import get_tbs_for_mcs
    from lteax.shard.pipeline import make_batch_decoder, make_batch_decoder_pallas
    from lteax.utils.metrics import EVENTS, METRICS
    from lteax.utils.trace import profile_to, stage
    import contextlib
    import os as _os
    if _os.environ.get("LTEAX_BENCH_EVENTLOG"):
        EVENTS.open(_os.environ["LTEAX_BENCH_EVENTLOG"])
    trace_dir = _os.environ.get("LTEAX_TRACE")

    cfg = PhyConfig(n_rb_dl=100)
    cid, sf, rnti, mcs, cfi = 214, 1, 0x1234, 28, 1
    prbs = tuple(range(100))
    tbs, scheme = get_tbs_for_mcs(mcs, 100)            # 75376, 64qam
    re_idx = pdsch_flat_idx(cfg, cid, cfi, prbs, sf)
    geom = pdsch_mod.pdsch_geometry(tbs, len(re_idx), 6, 0)

    # default batch 2304 since the r5 close-out B re-sweep (the PERF lesson:
    # re-sweep B after any big kernel/glue win): 768 (1690) < 1152 (1717) <
    # 1536 (1772) > 1920 (1743, dip) < 2304 (1781, best x2) > 3072 (1714);
    # 2304/2304 CRC, 2/6 iterations, compile 47 s.  The old B=576-class
    # fault EXPIRED under the r5 layout program (KNOWN_ISSUES)
    b = int(__import__("os").environ.get("LTEAX_BENCH_BATCH", "2304"))
    n_iter = int(__import__("os").environ.get("LTEAX_BENCH_TURBO_ITERS", "6"))
    reps = int(__import__("os").environ.get("LTEAX_BENCH_REPS", "10"))

    rng = np.random.default_rng(0)
    # build up to 64 unique transport blocks and tile (input building is
    # host-side prep, not the measured decode)
    b_uniq = min(b, 64)
    print(f"building {b_uniq} unique encoded 20 MHz subframes (tiled to {b}; "
          f"TBS {tbs}, C={geom.info.c}, K={geom.k})...", file=sys.stderr)
    tb_bits = rng.integers(0, 2, size=(b_uniq, tbs)).astype(np.int32)
    crs_idx = crs_flat_idx(cfg, cid, 0)
    vals = []
    for sym in crs_symbols(0, cfg):
        slot = sym // cfg.n_sym_slot
        vals.append(seq.crs_values(cid, 2 * sf + slot, sym % cfg.n_sym_slot,
                                   cfg.n_rb_dl))
    crs_vals = np.concatenate(vals)

    # Build inputs on the CPU backend (the TPU is benchmarked on DECODE only;
    # the axon backend also rejects eager dispatch + complex transfers, so
    # input building is cleanest on host CPU).
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cbs = np.stack([pdsch_mod.pdsch_prepare_cbs(tb_bits[i], geom)
                        for i in range(b_uniq)])
        enc = jax.jit(jax.vmap(lambda cb: pdsch_mod.pdsch_encode_cbs(
            cb, geom, rnti, sf, cid, scheme)), device=cpu)
        syms = np.asarray(enc(jnp.asarray(cbs)))
        grids = np.zeros((b_uniq, cfg.n_sym_subframe * cfg.n_sc),
                         dtype=np.complex64)
        grids[:, crs_idx] = crs_vals
        grids[:, re_idx] = syms
        x = np.asarray(subframe_to_samples(jnp.asarray(
            grids.reshape(b_uniq, cfg.n_sym_subframe, cfg.n_sc)), cfg))
    x = np.tile(x, (b // b_uniq + (1 if b % b_uniq else 0), 1))[:b]
    tb_bits = np.tile(tb_bits, (b // b_uniq + (1 if b % b_uniq else 0), 1))[:b]
    snr_db = float(__import__("os").environ.get("LTEAX_BENCH_SNR", "25"))
    nv = 10 ** (-snr_db / 10)  # default 25 dB — above the 64QAM r~0.93 bound
    x = x + (rng.standard_normal(x.shape)
             + 1j * rng.standard_normal(x.shape)) * np.sqrt(nv / 2)
    # bf16 IQ staging by default: halves the input HBM read (the measured
    # front floor) for +7% headline; per-sample quantization SNR ~48 dB is
    # 20+ dB below channel noise at any operating point (384/384 CRC
    # unchanged).  LTEAX_BENCH_IQ=f32|sc8 overrides.
    iq_fmt = __import__("os").environ.get("LTEAX_BENCH_IQ", "bf16")
    from lteax.io.iq import to_iq_f32, to_iq_bf16, to_iq_sc8
    to_iq = {"f32": to_iq_f32, "bf16": to_iq_bf16, "sc8": to_iq_sc8}[iq_fmt]
    xd = jax.device_put(jnp.asarray(to_iq(x)))

    use_pallas = __import__("os").environ.get("LTEAX_BENCH_PALLAS", "1") == "1"
    maker = make_batch_decoder_pallas if use_pallas else make_batch_decoder
    dec = maker(cfg, cid, cfi, prbs, sf, rnti, geom, scheme, n_iter=n_iter)
    print("compiling + warmup...", file=sys.stderr)
    t0 = time.time()
    out = dec(xd)
    bits, ok = out[0], out[1]
    jax.block_until_ready((bits, ok))
    it_msg = (f"; turbo iterations {int(np.asarray(out[2]))}/{n_iter}"
              if len(out) == 3 else "")
    print(f"compile+first run: {time.time()-t0:.1f}s; "
          f"crc ok: {int(np.sum(np.asarray(ok)))}/{b}{it_msg}",
          file=sys.stderr)
    n_ok = int(np.sum(np.asarray(ok)))
    if n_ok != b:
        print(f"WARNING: only {n_ok}/{b} TBs decoded", file=sys.stderr)

    times = []
    prof = profile_to(trace_dir) if trace_dir else contextlib.nullcontext()
    with prof:
        for _ in range(reps):
            with stage("decode_batch"):
                t0 = time.perf_counter()
                ok = dec(xd)[1]
                # a device->host transfer is the reliable completion
                # barrier on the axon backend (block_until_ready can return
                # early for small outputs); `ok` is tiny so the transfer
                # itself is negligible
                np.asarray(ok)
                times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    print(f"per-batch median {t*1e3:.2f} ms (min {min(times)*1e3:.2f})",
          file=sys.stderr)

    if __import__("os").environ.get("LTEAX_BENCH_PIPELINED", "1") == "1":
        # sustained mode: keep N batches in flight so host dispatch overlaps
        # device execution (how the streaming apps drive the chip); report
        # the better of sustained and per-batch — same work, same barrier
        depth = int(__import__("os").environ.get("LTEAX_BENCH_DEPTH", "2"))
        inflight = []
        t0 = time.perf_counter()
        for _ in range(reps):
            inflight.append(dec(xd))
            if len(inflight) >= depth:
                np.asarray(inflight.pop(0)[1])
        for r in inflight:
            np.asarray(r[1])
        t_sus = (time.perf_counter() - t0) / reps
        print(f"sustained ({depth} in flight): {t_sus*1e3:.2f} ms/batch",
              file=sys.stderr)
        t = min(t, t_sus)
    mbps = b * tbs / t / 1e6
    samples_per_s = b * cfg.n_samps_subframe / t
    print(f"best {t*1e3:.2f} ms/batch of {b} subframes; "
          f"{samples_per_s/1e6:.1f} Msps equivalent", file=sys.stderr)

    METRICS.gauge("bench.mbit_per_s", mbps)
    METRICS.inc("bench.tbs_decoded", b * reps)
    EVENTS.emit("bench.result", mbit_per_s=round(mbps, 2), batch=b,
                msps=round(samples_per_s / 1e6, 1))
    baseline = 75.376   # Mbit/s — reference real-time bound at this config
    print(json.dumps({
        "metric": "decoded DL-SCH throughput, 20 MHz MCS28 (TBS 75376), "
                  f"turbo max-6-iter with CRC early stop, {iq_fmt} IQ in",
        "value": round(mbps, 2),
        "unit": "Mbit/s/chip",
        "vs_baseline": round(mbps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
