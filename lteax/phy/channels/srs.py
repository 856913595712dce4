"""SRS — sounding reference signal (36.211 §5.5.3).

(reference capability: SURVEY.md §2.2 marks SRS "[U] if present" in
``liblte_phy``; implemented here for UL capability completeness.)

An SRS occupies the LAST SC-FDMA symbol of the subframe on a comb-2
(every other subcarrier, transmissionComb k_TC in {0,1}) over m_srs PRBs,
using the same Zadoff-Chu base sequences as the PUSCH DM-RS with cyclic
shift alpha = 2*pi*n_cs/8 (n_cs in 0..7).  Up to 8 UEs sound the same
comb simultaneously, separated by cyclic shift; the eNB detector
correlates in the delay domain where each shift appears as an impulse at
delay offset n_cs/8 of the window.

The srs-BandwidthConfig trees (36.211 Tables 5.5.3.2-1..4) are data
tables; ``m_srs`` is taken directly as a parameter (multiple of 4 PRBs)
rather than via config indices, with the common full-band values noted
at the call sites.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lteax.phy.channels.pusch import base_sequence

SRS_SYM = 13          # last SC-FDMA symbol, normal CP


def srs_sequence(u: int, m_srs: int, n_cs: int = 0, v: int = 0) -> np.ndarray:
    """Frequency-domain SRS values on its comb: (m_srs*6,) complex64.

    r(n) = e^{j alpha n} r_{u,v}(n) with M_sc^RS = m_srs*12/2 (comb-2)."""
    m_sc = m_srs * 6
    base = base_sequence(u, m_sc, v)
    alpha = 2.0 * np.pi * n_cs / 8.0
    return (base * np.exp(1j * alpha * np.arange(m_sc))).astype(np.complex64)


def srs_subcarriers(n_rb_ul: int, m_srs: int, k_tc: int = 0,
                    rb_offset: int = 0) -> np.ndarray:
    """Subcarrier indices of the comb within the UL grid (m_srs*6,)."""
    if m_srs + rb_offset > n_rb_ul:
        raise ValueError("SRS exceeds UL bandwidth")
    k0 = rb_offset * 12 + k_tc
    return (k0 + 2 * np.arange(m_srs * 6)).astype(np.int32)


def srs_add(grid: np.ndarray, n_rb_ul: int, u: int, m_srs: int,
            n_cs: int = 0, k_tc: int = 0, rb_offset: int = 0,
            amp: float = 1.0) -> np.ndarray:
    """Host-side: add an SRS into the (14, n_rb_ul*12) UL grid."""
    g = np.asarray(grid).copy()
    sc = srs_subcarriers(n_rb_ul, m_srs, k_tc, rb_offset)
    g[SRS_SYM, sc] += amp * srs_sequence(u, m_srs, n_cs)
    return g


def srs_detect(grid: jnp.ndarray, n_rb_ul: int, u: int, m_srs: int,
               k_tc: int = 0, rb_offset: int = 0):
    """Delay-domain SRS detector for all 8 cyclic shifts at once.

    Correlates the received comb against the base sequence and IFFTs to
    the delay domain; cyclic shift n_cs concentrates its energy around
    delay bin n_cs*M/8.  Returns (powers (8,), peak_delay (8,)): per-shift
    correlated power (normalized so noise-only input gives ~1/M each) and
    the fractional-delay bin of each shift's peak within its window.
    """
    m_sc = m_srs * 6
    sc = jnp.asarray(srs_subcarriers(n_rb_ul, m_srs, k_tc, rb_offset))
    rx = grid[SRS_SYM, sc]
    ref = jnp.asarray(srs_sequence(u, m_srs, 0))
    corr = rx * jnp.conj(ref)                     # flat if shift 0 present
    cir = jnp.fft.ifft(corr)                      # delay-domain impulse(s)
    p = jnp.abs(cir) ** 2
    total = jnp.maximum(jnp.sum(p), 1e-24)
    win = m_sc // 8
    pw = p.reshape(8, win)
    powers = jnp.sum(pw, axis=1) / total
    peak = jnp.argmax(pw, axis=1)
    return powers, peak


def srs_estimate_channel(grid: jnp.ndarray, n_rb_ul: int, u: int,
                         m_srs: int, n_cs: int = 0, k_tc: int = 0,
                         rb_offset: int = 0) -> jnp.ndarray:
    """LS wideband channel estimate on the sounded comb for one UE:
    (m_srs*6,) complex — rx / (base * shift)."""
    sc = jnp.asarray(srs_subcarriers(n_rb_ul, m_srs, k_tc, rb_offset))
    ref = jnp.asarray(srs_sequence(u, m_srs, n_cs))
    return grid[SRS_SYM, sc] * jnp.conj(ref)
