"""Sharded bulk-decode pipelines (configs #4/#5 of BASELINE.json).

The full per-subframe PDSCH receive chain — OFDM demod, channel estimation,
equalization, LLR demapping, descrambling, rate de-matching, turbo decode,
CRC — as ONE jitted function, vmapped over a subframe batch and sharded over
a (chan, time) device mesh with ``shard_map``.  The reference processes
subframes serially on one core (SURVEY.md §3.5); here the batch IS the
parallelism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lteax.phy.config import PhyConfig
from lteax.phy import chest
from lteax.phy.ofdm import samples_to_subframe
from lteax.phy.grid import pdsch_flat_idx, make_flat_extractor
from lteax.phy.mod import demodulate_maxlog
from lteax.phy.channels import pdsch as pdsch_mod
from lteax.shard.mesh import TIME_AXIS, CHAN_AXIS


def make_subframe_decoder(cfg: PhyConfig, n_cell_id: int, cfi: int,
                          prbs: tuple[int, ...], subframe: int, rnti: int,
                          geom, scheme: str, n_iter: int = 6):
    """Returns jittable fn: samples (n_samps_subframe, 2) float32 IQ ->
    (tb_bits (TBS,), tb_ok scalar bool).

    IO is float32 IQ pairs (complex transfers are unsupported on the TPU
    backend — see io.iq.to_iq_f32); complex forms inside the jit."""
    re_idx = pdsch_flat_idx(cfg, n_cell_id, cfi, prbs, subframe)
    # slice/reshape extractor instead of x[re_idx]: TPU gathers run ~1
    # element/cycle and dominated the front-end (~2.2 ms/batch(64))
    extract, _, _ = make_flat_extractor(re_idx, cfg.n_sym_subframe, cfg.n_sc)

    def decode_one(samples_iq: jnp.ndarray):
        samples = (samples_iq[..., 0] + 1j * samples_iq[..., 1]
                   ).astype(jnp.complex64)
        grid = samples_to_subframe(samples, cfg)
        h = chest.estimate_channel(grid, cfg, n_cell_id, subframe, port=0)
        nv = chest.estimate_noise_var(grid, cfg, n_cell_id, subframe)
        x_eq, eff_nv = chest.equalize_siso(grid.reshape(-1), h.reshape(-1), nv)
        llr = demodulate_maxlog(extract(x_eq), scheme, extract(eff_nv))
        tb, ok, _ = pdsch_mod.pdsch_decode_device(llr, geom, rnti, subframe,
                                                  n_cell_id, n_iter=n_iter)
        return tb, ok

    return decode_one


def make_batch_decoder(cfg, n_cell_id, cfi, prbs, subframe, rnti, geom,
                       scheme, n_iter: int = 6):
    """(B, n_samps, 2) f32 -> ((B, TBS), (B,)) — single-device batched decoder."""
    one = make_subframe_decoder(cfg, n_cell_id, cfi, prbs, subframe, rnti,
                                geom, scheme, n_iter)
    return jax.jit(jax.vmap(one))


def make_batch_decoder_pallas(cfg, n_cell_id, cfi, prbs, subframe, rnti,
                              geom, scheme, n_iter: int = 6, tb: int | None = None,
                              interpret: bool = False):
    import os
    if tb is None:
        tb = int(os.environ.get("LTEAX_PALLAS_TB", "16"))
    """Like make_batch_decoder but the turbo stage runs as ONE flat Pallas
    batch over all (subframe x codeblock) blocks — the production path."""
    from lteax.phy import seq
    from lteax.phy.fec.crc import check_crc
    from lteax.phy.channels.pdsch import _c_init, soft_dematch
    from lteax.kernels.turbo_mlm import turbo_decode_batch_pallas

    re_idx = pdsch_flat_idx(cfg, n_cell_id, cfi, prbs, subframe)
    extract, _, _ = make_flat_extractor(re_idx, cfg.n_sym_subframe, cfg.n_sc)
    d_len = geom.k + 4

    # batch-invariant scrambling signs, precomputed on host (computing the
    # Gold sequence inside the vmapped front cost ~6 ms/batch(384))
    # c_init computed in python ints: the eager jnp _c_init path hits the
    # axon backend's eager-dispatch rejection intermittently (FAILED_
    # PRECONDITION during decoder construction)
    sgn = jnp.asarray(seq.scrambling_symbols_np(
        int(rnti) * 2 ** 14 + int(subframe) * 512 + int(n_cell_id),
        geom.g))

    def front(samples_iq):
        # device-boundary IQ may be f32, bf16 or int8 pairs (bf16/int8 halve/
        # quarter the input HBM read — the measured front-end floor; the
        # decode chain is scale-invariant, so int8's /128 needs no correction)
        samples = (samples_iq[..., 0].astype(jnp.float32)
                   + 1j * samples_iq[..., 1].astype(jnp.float32)
                   ).astype(jnp.complex64)
        grid = samples_to_subframe(samples, cfg)
        h = chest.estimate_channel(grid, cfg, n_cell_id, subframe, port=0)
        nv = chest.estimate_noise_var(grid, cfg, n_cell_id, subframe)
        x_eq, eff_nv = chest.equalize_siso(grid.reshape(-1), h.reshape(-1), nv)
        llr = demodulate_maxlog(extract(x_eq), scheme, extract(eff_nv))
        return llr * sgn

    import os
    win = int(os.environ.get("LTEAX_PALLAS_WIN", "128"))
    # acq=16 measured statistically identical to 32 at/below the MCS28
    # threshold (NII seeds window boundaries after iteration 1), and ~9%
    # faster end-to-end
    acq = int(os.environ.get("LTEAX_PALLAS_ACQ", "16"))
    gb_env = os.environ.get("LTEAX_PALLAS_GB", "auto")
    gb = None if gb_env == "auto" else int(gb_env)
    # bf16 trellis arithmetic/stores with per-block renormalisation:
    # +7.5% headline throughput, 384/384 CRC at the operating point,
    # ~0.1 dB sensitivity cost at the MCS28 threshold (PERF.md); f32 via env
    mdtype = os.environ.get("LTEAX_PALLAS_DTYPE", "bf16")
    # CRC-based early termination: stop once every codeblock checks
    early = os.environ.get("LTEAX_PALLAS_EARLYSTOP", "1") == "1"
    early_crc = ("24B" if geom.info.cb_crc else "24A") if early else None
    # extrinsic damping (max-log standard 0.75); higher converges faster at
    # comfortable margins, lower is safer near threshold
    ext_scale = float(os.environ.get("LTEAX_EXT_SCALE", "0.75"))

    def stage_front(samples_iq):
        llr = jax.vmap(front)(samples_iq)              # (B, G)
        if mdtype.startswith("bf16"):
            # carry LLRs in the trellis dtype: halves de-match + turbo-input
            # HBM traffic (the kernel computes in bf16 anyway)
            llr = llr.astype(jnp.bfloat16)
        # de-match at batch level (natively batched)
        return soft_dematch(llr, geom)                 # (B, C, 3, D)

    # diagnostic: report how many turbo iterations the early stop ran
    print_iters = os.environ.get("LTEAX_PRINT_ITERS", "0") == "1"

    def stage_turbo(d_llr):
        bsz = d_llr.shape[0]
        flat = d_llr.reshape(bsz * geom.info.c, 3, d_len)
        out = turbo_decode_batch_pallas(flat, geom.k, n_iter=n_iter, tb=tb,
                                        win=win, acq=acq, gb=gb,
                                        early_crc=early_crc, mdtype=mdtype,
                                        ext_scale=ext_scale,
                                        return_n_iter=print_iters,
                                        interpret=interpret)
        bits, n_it = out if print_iters else (out, None)
        bits = bits.reshape(bsz, geom.info.c, geom.k)
        if geom.info.cb_crc:
            payload, cb_ok = check_crc(bits, "24B")
        else:
            payload, cb_ok = bits, jnp.ones((bsz, geom.info.c), bool)
        tb_full = pdsch_mod.desegment_device(payload, geom.info)
        tb_bits, ok = check_crc(tb_full, "24A")
        ok = ok & jnp.all(cb_ok, axis=-1)
        return (tb_bits, ok, n_it) if print_iters else (tb_bits, ok)

    # Two jit programs, not one: composing the front's slice/concat graphs
    # with the Pallas kernel in a single program crashes the TPU worker on
    # this backend (KNOWN_ISSUES.md), the split measures slightly FASTER
    # (173.9 vs ~196 ms at fixed-6/B=384 — less fusion pressure), and it
    # unlocks the structured de-match (LTEAX_STRUCT_DEMATCH=1).  Calls chain
    # asynchronously, so there is no extra host round-trip.
    if interpret:
        return jax.jit(lambda s: stage_turbo(stage_front(s)))
    f1, f2 = jax.jit(stage_front), jax.jit(stage_turbo)
    return lambda samples_iq: f2(f1(samples_iq))


def make_pusch_batch_decoder(alloc, rnti: int, subframe: int, n_cell_id: int,
                             n_iter: int = 6, noise_var: float = 1e-3,
                             interpret: bool = False):
    """Batched UL-SCH (PUSCH) production decoder with the DL levers applied.

    (B, 14, m_sc, 2) float32 IQ grids -> ((B, TBS), (B,) ok).

    Same receive chain as :func:`lteax.phy.channels.pusch.pusch_decode`
    (DM-RS LS chest + linear time interp, unbiased MMSE eq, IDFT
    de-precoding, max-log demap, descramble, channel de-interleave,
    de-match, turbo, CRC) restructured for throughput exactly like the
    PDSCH path above: scrambling signs precomputed on host, the channel
    de-interleaver as a pure reshape/transpose (data-only PUSCH: the
    36.212 §5.2.2.8 matrix is rectangular), de-match applied once at batch
    level, and a two-program front/turbo split feeding the Pallas kernel
    (early-stop + compacted straggler retry).

    (reference capability: ``liblte/src/liblte_phy.cc ::
    liblte_phy_pusch_channel_decode`` — serial per-subframe C++.)"""
    import os
    import numpy as np
    from lteax.phy import seq
    from lteax.phy.fec.crc import check_crc
    from lteax.phy.channels.pdsch import soft_dematch
    from lteax.phy.channels import pusch as pu
    from lteax.kernels.turbo_mlm import turbo_decode_batch_pallas

    geom = alloc.geom
    m_sc = alloc.m_sc
    d_len = geom.k + 4
    data_syms = [s for s in range(14) if s not in pu.DMRS_SYMS]
    ref0 = np.conj(pu.dmrs_pusch(n_cell_id, 2 * subframe, m_sc))
    ref1 = np.conj(pu.dmrs_pusch(n_cell_id, 2 * subframe + 1, m_sc))
    w = np.clip(np.asarray(
        [(s - pu.DMRS_SYMS[0]) / (pu.DMRS_SYMS[1] - pu.DMRS_SYMS[0])
         for s in data_syms], dtype=np.float32), 0.0, 1.0)[:, None]
    sgn = jnp.asarray(seq.scrambling_symbols_np(
        int(rnti) * 2 ** 14 + int(subframe) * 512 + int(n_cell_id),
        geom.g))   # python-int c_init: avoids eager axon dispatch
    r_mux = geom.g // (12 * alloc.qm)
    assert geom.g == 12 * r_mux * alloc.qm, "data-only PUSCH interleaver"
    nv = noise_var

    mdtype = os.environ.get("LTEAX_PALLAS_DTYPE", "bf16")
    win = int(os.environ.get("LTEAX_PALLAS_WIN", "128"))
    acq = int(os.environ.get("LTEAX_PALLAS_ACQ", "16"))
    tb_ = int(os.environ.get("LTEAX_PALLAS_TB", "16"))
    early = os.environ.get("LTEAX_PALLAS_EARLYSTOP", "1") == "1"
    early_crc = ("24B" if geom.info.cb_crc else "24A") if early else None

    def front(g_iq):                         # (14, m_sc, 2) f32
        grid = (g_iq[..., 0] + 1j * g_iq[..., 1]).astype(jnp.complex64)
        # delay-domain denoised LS chest (see pusch.chest_taps: the raw
        # per-subcarrier estimate costs ~3 dB effective SNR and a full
        # extra turbo iteration batch-wide)
        h0 = pu.chest_denoise(grid[pu.DMRS_SYMS[0]] * ref0)
        h1 = pu.chest_denoise(grid[pu.DMRS_SYMS[1]] * ref1)
        h = (1 - w) * h0[None] + w * h1[None]
        y = grid[jnp.asarray(data_syms)]
        p = jnp.abs(h) ** 2
        xf = y * jnp.conj(h) / (p + nv)
        xf = xf / jnp.maximum(p / (p + nv), 1e-12)
        xt = pu._ul_dft(xf, inverse=True)
        eff = jnp.mean(nv / jnp.maximum(p, 1e-12), axis=-1,
                       keepdims=True) * jnp.ones_like(p)
        llr = demodulate_maxlog(xt.reshape(-1), alloc.scheme, eff.reshape(-1))
        llr = llr * sgn
        if mdtype.startswith("bf16"):
            llr = llr.astype(jnp.bfloat16)
        # channel DE-interleaver (36.212 §5.2.2.8, data-only) is a pure
        # rectangular transpose: (C_mux=12, R_mux, Qm) -> row-major
        return llr.reshape(12, r_mux, alloc.qm).transpose(1, 0, 2).reshape(-1)

    def stage_front(batch_iq):
        llr = jax.vmap(front)(batch_iq)                # (B, G)
        return soft_dematch(llr, geom)                 # (B, C, 3, D)

    print_iters = os.environ.get("LTEAX_PRINT_ITERS", "0") == "1"

    def stage_turbo(d_llr):
        bsz = d_llr.shape[0]
        flat = d_llr.reshape(bsz * geom.info.c, 3, d_len)
        out = turbo_decode_batch_pallas(flat, geom.k, n_iter=n_iter,
                                        win=win, acq=acq, tb=tb_,
                                        mdtype=mdtype, early_crc=early_crc,
                                        return_n_iter=print_iters,
                                        interpret=interpret)
        bits, n_it = out if print_iters else (out, None)
        bits = bits.reshape(bsz, geom.info.c, geom.k)
        if geom.info.cb_crc:
            payload, cb_ok = check_crc(bits, "24B")
        else:
            payload, cb_ok = bits, jnp.ones((bsz, geom.info.c), bool)
        tb_full = pdsch_mod.desegment_device(payload, geom.info)
        tb_bits, ok = check_crc(tb_full, "24A")
        ok = ok & jnp.all(cb_ok, axis=-1)
        return (tb_bits, ok, n_it) if print_iters else (tb_bits, ok)

    if interpret:
        return jax.jit(lambda g: stage_turbo(stage_front(g)))
    f1, f2 = jax.jit(stage_front), jax.jit(stage_turbo)
    dec = lambda batch_iq: f2(f1(batch_iq))
    dec.stage_front, dec.stage_turbo = f1, f2   # exposed for bench breakdowns
    return dec


def make_mimo_batch_decoder(cfg, n_cell_id, cfi, prbs, subframe, rnti, geom,
                            scheme, n_iter: int = 6, interpret: bool = False):
    """Batched 2x2 TM3 dual-codeword production decoder (DL levers applied).

    (2 rx, B, n_samps, 2) float32 IQ -> ((2B, TBS), (2B,) ok): OFDM demod on
    both RX antennas, CRS chest per (rx, port) — the two RX rows batched
    through one chest call per port — structured-slice RE extraction
    (no flat gathers), per-RE unbiased MMSE demix, both layers demapped in
    one call, host-precomputed per-codeword scrambling, batch-level
    de-match, and the two-program front/turbo split with ONE fused Pallas
    batch over both codewords.

    (reference capability: beyond ``liblte_phy``'s single-codeword
    ceiling — SURVEY.md §2.2 layer map / precoding row.)"""
    import os
    import numpy as np
    from lteax.phy import mimo, seq
    from lteax.phy.fec.crc import check_crc
    from lteax.phy.channels.pdsch import _c_init, soft_dematch
    from lteax.kernels.turbo_mlm import turbo_decode_batch_pallas

    re_idx = jnp.asarray(pdsch_flat_idx(cfg, n_cell_id, cfi, prbs, subframe))
    d_len = geom.k + 4
    sgn = jnp.asarray(np.stack(
        [seq.scrambling_symbols_np(
            int(rnti) * 2 ** 14 + q * 2 ** 13 + int(subframe) * 512
            + int(n_cell_id), geom.g)
         for q in range(2)]))   # python-int c_init: avoids eager axon dispatch

    mdtype = os.environ.get("LTEAX_PALLAS_DTYPE", "bf16")
    win = int(os.environ.get("LTEAX_PALLAS_WIN", "128"))
    acq = int(os.environ.get("LTEAX_PALLAS_ACQ", "16"))
    tb_ = int(os.environ.get("LTEAX_PALLAS_TB", "16"))
    early = os.environ.get("LTEAX_PALLAS_EARLYSTOP", "1") == "1"
    early_crc = ("24B" if geom.info.cb_crc else "24A") if early else None

    # chest mode: "ls" = LS + linear 2D interp (default), "mmse" = Wiener
    # frequency interpolation (chest.estimate_channel_mmse).  Same-session
    # A/B at B=192 / 25 dB: ls 496.8 Mbit/s (58.3 ms sustained), mmse
    # 397.4 (72.8 ms) — the HIGHEST-precision Wiener matmuls cost ~14 ms
    # and do not cut the batch iteration count at this operating point.
    chest_mode = os.environ.get("LTEAX_MIMO_CHEST", "ls")
    denoise = os.environ.get("LTEAX_MIMO_DENOISE", "0") == "1"

    nv_prior = float(os.environ.get("LTEAX_MIMO_CHEST_NV", "3e-3"))

    def front(sub_iq):                       # (2 rx, n_samps, 2)
        # NOTE front structure chosen by measurement (bench/mimo_front_probe*):
        # per-rx chest calls + flat re_idx gathers + per-codeword demap with
        # the de-match hoisted to batch level measured 43 ms/batch(192);
        # "cleaner" batched-chest + structured-extract + joint-demap combos
        # measured 81-82 ms (backend fusion interaction — each change alone
        # is neutral).
        s = (sub_iq[..., 0] + 1j * sub_iq[..., 1]).astype(jnp.complex64)
        grids = jax.vmap(lambda ss: samples_to_subframe(ss, cfg))(s)
        if chest_mode == "mmse":
            # STATIC noise prior -> host-precomputed Wiener matrix (the
            # traced-nv on-device solve is bf16-catastrophic on TPU)
            est = lambda r, t: chest.estimate_channel_mmse(
                grids[r], cfg, n_cell_id, subframe, port=t,
                noise_var=nv_prior)
        else:
            # pilot-level delay-domain denoise (the UL lever applied to the
            # CRS chest; drops the batch turbo count 3/6 -> 2/6 at 25 dB)
            est = lambda r, t: chest.estimate_channel(
                grids[r], cfg, n_cell_id, subframe, port=t,
                denoise=denoise)
        h = jnp.stack([jnp.stack([est(r, t).reshape(-1)[re_idx]
                                  for t in range(2)]) for r in range(2)])
        nvar = chest.estimate_noise_var(grids[0], cfg, n_cell_id, subframe)
        y = jnp.stack([grids[r].reshape(-1)[re_idx] for r in range(2)])
        x_hat, eff = mimo.mmse_demix_2layers(y, mimo.heff_tm3(h), nvar)
        outs = []
        for q in range(2):
            llr = demodulate_maxlog(x_hat[q], scheme, eff[q])
            llr = llr * sgn[q]
            if mdtype.startswith("bf16"):
                llr = llr.astype(jnp.bfloat16)
            outs.append(llr)
        return jnp.stack(outs)               # (2 cw, G)

    def stage_front(batch_iq):               # (2rx, B, n_samps, 2)
        llr = jax.vmap(front, in_axes=1)(batch_iq)       # (B, 2, G)
        return soft_dematch(llr.reshape(-1, geom.g), geom)

    print_iters = os.environ.get("LTEAX_PRINT_ITERS", "0") == "1"

    def stage_turbo(d_llr):
        c2 = d_llr.shape[0]                  # 2B codewords
        flat = d_llr.reshape(c2 * geom.info.c, 3, d_len)
        out = turbo_decode_batch_pallas(flat, geom.k, n_iter=n_iter,
                                        win=win, acq=acq, tb=tb_,
                                        mdtype=mdtype, early_crc=early_crc,
                                        return_n_iter=print_iters,
                                        interpret=interpret)
        bits, n_it = out if print_iters else (out, None)
        bits = bits.reshape(c2, geom.info.c, geom.k)
        if geom.info.cb_crc:
            payload, cb_ok = check_crc(bits, "24B")
        else:
            payload, cb_ok = bits, jnp.ones((c2, geom.info.c), bool)
        tb_full = pdsch_mod.desegment_device(payload, geom.info)
        tb_bits, ok = check_crc(tb_full, "24A")
        ok = ok & jnp.all(cb_ok, axis=-1)
        return (tb_bits, ok, n_it) if print_iters else (tb_bits, ok)

    if interpret:
        return jax.jit(lambda g: stage_turbo(stage_front(g)))
    f1, f2 = jax.jit(stage_front), jax.jit(stage_turbo)
    dec = lambda batch_iq: f2(f1(batch_iq))
    dec.stage_front, dec.stage_turbo = f1, f2   # exposed for bench breakdowns
    return dec


def make_sharded_decoder(mesh, cfg, n_cell_id, cfi, prbs, subframe, rnti,
                         geom, scheme, n_iter: int = 6):
    """Time-sharded bulk decoder: (B_total, n_samps) sharded on axis 0 over
    the ``time`` mesh axis -> (bits, ok, n_ok_psum).

    ``n_ok_psum`` (replicated scalar) exercises the metric-psum path.
    """
    one = make_subframe_decoder(cfg, n_cell_id, cfi, prbs, subframe, rnti,
                                geom, scheme, n_iter)

    def local(samples):
        bits, ok = jax.vmap(one)(samples)
        n_ok = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), TIME_AXIS)
        # the in_specs replicate the batch over the chan axis, so chan
        # replicas all hold the same count — pmean (not psum) keeps n_ok
        # equal to the number of distinct decoded TBs on any mesh shape
        n_ok = jax.lax.pmean(n_ok, CHAN_AXIS)
        return bits, ok, n_ok

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(TIME_AXIS, None, None),),
                   out_specs=(P(TIME_AXIS, None), P(TIME_AXIS), P()))
    return jax.jit(fn)
