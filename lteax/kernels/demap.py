"""Pallas TPU kernel: fused max-log QAM demap + LLR scaling + descramble.

(SURVEY.md §7 step 6b-class front-end kernel; VERDICT r2 item 3.)

The XLA demap path materializes several (B, G) f32 intermediates (distance
stacks, I/Q interleave, noise division, scramble multiply) — measured
~3.5 ms of the 9.5 ms DL front at B=384.  This kernel computes the exact
per-axis PAM subset-min LLRs (identical math to
``lteax.phy.mod.demodulate_maxlog``) in ONE pass over VMEM tiles and writes
bf16 LLRs directly, fusing the 1/noise scaling and the scrambling sign.

Output is PLANAR — (B, m, N): plane j holds bit j of every symbol — so each
of the m per-bit expressions is one contiguous (tile, lanes) store instead
of an m-way interleave relayout.  The rate de-matcher absorbs the layout
change by remapping its gather indices (host-side, free):
``lteax.phy.channels.pdsch.soft_dematch_planar``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lteax.phy.mod import BITS_PER_SYM, _pam_axis


def _make_kernel(scheme: str, ma: int, out_dtype):
    pam, bit1 = _pam_axis(scheme)            # (L,), (ma, L)
    levels = [float(s) for s in pam]
    subsets = []                             # per axis-bit: (zeros, ones)
    for j in range(ma):
        subsets.append(([i for i in range(len(levels)) if not bit1[j, i]],
                        [i for i in range(len(levels)) if bit1[j, i]]))

    def kernel(xr, xi, inv_nv, sgn, out):
        # distances/LLRs compute in f32 whatever the input staging dtype:
        # bf16 inputs (DecoderTuning.demap_in) halve the HBM boundary (the
        # kernel is HBM-bound — roofline), the arithmetic is unchanged
        f32 = jnp.float32
        scale = inv_nv[:, :].astype(f32)
        for axis, y in ((0, xr[:, :].astype(f32)), (1, xi[:, :].astype(f32))):
            # exact subset-min: d_k = (y - s_k)^2, same expression as the
            # XLA path (y^2 cancels in the difference but keeping it makes
            # the arithmetic bit-identical)
            d = [(y - s) * (y - s) for s in levels]
            for j, (zeros, ones) in enumerate(subsets):
                d0 = d[zeros[0]]
                for i in zeros[1:]:
                    d0 = jnp.minimum(d0, d[i])
                d1 = d[ones[0]]
                for i in ones[1:]:
                    d1 = jnp.minimum(d1, d[i])
                # bit order per symbol: (b0|I, b1|Q, b2|I, b3|Q, ...) —
                # plane index is the within-symbol bit position
                plane = 2 * j + axis
                out[:, plane, :] = ((d1 - d0) * scale * sgn[plane, :]
                                    ).astype(out_dtype)

    return kernel


@partial(jax.jit, static_argnames=("scheme", "out_dtype", "tb", "interpret"))
def demap_descr_planar_pallas(xr, xi, inv_nv, sgn_planar, scheme: str,
                              out_dtype=jnp.bfloat16, tb: int = 8,
                              interpret: bool = False):
    """xr, xi, inv_nv: (B, N) f32 equalized symbol I/Q and 1/eff_noise;
    sgn_planar: (m, Np) f32 descrambling signs in planar layout
    (``planar_sgn``).  Returns (B, m, Np) LLRs, Np = N padded to the lane
    multiple; padded lanes hold garbage (the planar de-match gather never
    reads them)."""
    m = BITS_PER_SYM[scheme]
    ma = m // 2
    assert scheme in ("qpsk", "16qam", "64qam"), scheme
    bsz, n = xr.shape
    # lane padding follows the sign planes when they are wider: the DL
    # full-grid path guarantees >=1 zeroed pad column as the de-match
    # maps' zero slot (shard/pipeline.py)
    npad = max(-(-n // 128) * 128, sgn_planar.shape[1])
    bpad = -(-bsz // tb) * tb
    pad = lambda x: jnp.pad(x, ((0, bpad - bsz), (0, npad - n)))
    xr, xi, inv_nv = pad(xr), pad(xi), pad(inv_nv)
    assert sgn_planar.shape == (m, npad), (sgn_planar.shape, m, npad)

    kernel = _make_kernel(scheme, ma, out_dtype)
    grid = (bpad // tb,)
    bs_in = pl.BlockSpec((tb, npad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    bs_sgn = pl.BlockSpec((m, npad), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bs_in, bs_in, bs_in, bs_sgn],
        out_specs=pl.BlockSpec((tb, m, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, m, npad), out_dtype),
        interpret=interpret,
    )(xr, xi, inv_nv, sgn_planar)
    return out[:bsz]


# bounded: c_init varies per (rnti, subframe, codeword) — a long-running
# service building decoders for many RNTIs must not grow host memory
# without bound (each entry is an (m, npad) f32 array)
@lru_cache(maxsize=64)
def planar_sgn_np(c_init: int, g: int, m: int, npad: int) -> np.ndarray:
    """(m, npad) f32 scrambling signs in planar layout: plane j, column s
    holds the sign of interleaved bit s*m + j."""
    from lteax.phy.seq import scrambling_symbols_np
    sgn = scrambling_symbols_np(c_init, g)            # (G,)
    n = g // m
    out = np.ones((m, npad), dtype=np.float32)
    out[:, :n] = sgn.reshape(n, m).T
    return out
