"""PRACH: random access preambles — generation and detection (36.211 §5.7).

(reference capability: ``liblte/src/liblte_phy.cc ::
liblte_phy_generate_prach`` / ``liblte_phy_detect_prach``.)

Preamble formats 0-3 (FDD): length-839 Zadoff-Chu at 1.25 kHz subcarrier
spacing.  TPU-native design: generation is an 839-point DFT placed into one
big IFFT; detection is the classic frequency-domain correlator — multiply
the received window's 839 bins by conj(root DFT), one 1024-ish IFFT, find
peaks per cyclic-shift zone.  Both batch over (roots x windows).

Logical->physical root ordering (Table 5.7.2-4) is provided for the first
entries (PROVENANCE: spec-from-memory, empty reference mount — validated
only structurally); ``u`` may also be given physically.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

N_ZC = 839
DELTA_F_RA = 1250.0   # Hz

# format: (T_cp in Ts units of 1/30.72e6, T_seq)
PRACH_FORMATS = {
    0: (3168, 24576),
    1: (21024, 24576),
    2: (6240, 2 * 24576),
    3: (21024, 2 * 24576),
}

# Table 5.7.2-4 head (logical index -> physical root u); [U]-tagged
LOGICAL_ROOTS = (129, 710, 140, 699, 120, 719, 210, 629, 168, 671, 84, 755,
                 105, 734, 93, 746, 70, 769, 60, 779, 2, 837, 1, 838,
                 56, 783, 112, 727, 148, 691)

# Table 5.7.2-2: zeroCorrelationZoneConfig -> N_cs (unrestricted set)
NCS_UNRESTRICTED = (0, 13, 15, 18, 22, 26, 32, 38, 46, 59, 76, 93, 119, 167,
                    279, 419)


def physical_root(logical_idx: int) -> int:
    if logical_idx < len(LOGICAL_ROOTS):
        return LOGICAL_ROOTS[logical_idx]
    raise KeyError(
        f"logical root {logical_idx} beyond the transcribed head of Table "
        f"5.7.2-4 — pass a physical root instead")


@lru_cache(maxsize=None)
def zc_root_seq(u: int) -> np.ndarray:
    n = np.arange(N_ZC)
    return np.exp(-1j * np.pi * u * n * (n + 1) / N_ZC).astype(np.complex64)


def preamble_freq(u: int, v: int, n_cs: int) -> np.ndarray:
    """Frequency-domain (839,) preamble for cyclic shift index v."""
    cv = v * n_cs
    x = np.roll(zc_root_seq(u), -cv)
    return np.fft.fft(x).astype(np.complex64) / np.sqrt(N_ZC)


def generate_prach(u: int, v: int, n_cs: int, fmt: int = 0,
                   fs: float = 30.72e6) -> np.ndarray:
    """Baseband PRACH burst (CP + sequence), centered at DC + 7.5 kHz-ish
    offset per 36.211 (k0 terms for in-grid placement are applied by the
    caller via frequency shift; this returns the pure preamble waveform)."""
    t_cp, t_seq = PRACH_FORMATS[fmt]
    scale = fs / 30.72e6
    n_cp, n_seq = int(t_cp * scale), int(t_seq * scale)
    n_fft = int(24576 * scale)
    xf = preamble_freq(u, v, n_cs)
    grid = np.zeros(n_fft, dtype=np.complex64)
    # 839 bins at 1.25 kHz; center the sequence around DC
    k = np.arange(N_ZC) - N_ZC // 2
    grid[k % n_fft] = xf
    one_seq = np.fft.ifft(grid) * np.sqrt(n_fft)
    reps = n_seq // n_fft
    seq = np.tile(one_seq, max(reps, 1))[:n_seq]
    return np.concatenate([seq[-n_cp:], seq]).astype(np.complex64)


def detect_prach(rx: np.ndarray, u: int, n_cs: int, fmt: int = 0,
                 fs: float = 30.72e6, threshold: float = 8.0):
    """Detect preambles in a received burst window.

    rx: samples covering (at least) the sequence part, CP already skipped.
    Returns list of (v, delay_samples, metric) for peaks above
    ``threshold`` x mean power, one strongest per cyclic-shift zone.
    """
    scale = fs / 30.72e6
    n_fft = int(24576 * scale)
    win = np.fft.fft(np.asarray(rx[:n_fft]), n_fft) / np.sqrt(n_fft)
    k = np.arange(N_ZC) - N_ZC // 2
    rx_bins = win[k % n_fft]
    ref = np.fft.fft(zc_root_seq(u)) / np.sqrt(N_ZC)
    prod = rx_bins * np.conj(ref)
    corr = np.fft.ifft(prod, N_ZC) * np.sqrt(N_ZC)
    power = np.abs(corr) ** 2
    mean_p = np.mean(power)
    out = []
    n_shifts = N_ZC // n_cs if n_cs > 0 else 1
    samples_per_zc = n_fft / N_ZC     # delay granularity in output samples
    # preamble v with propagation delay tau (ZC units, 0 <= tau < N_cs)
    # peaks at index  (N_ZC - v*N_cs + tau) mod N_ZC
    for v in range(n_shifts):
        z_v = (N_ZC - v * n_cs) % N_ZC
        idxs = (z_v + np.arange(n_cs)) % N_ZC
        zone = power[idxs]
        tau = int(np.argmax(zone))
        m = float(zone[tau] / mean_p)
        if m > threshold:
            out.append((v, int(round(tau * samples_per_zc)), m))
    return out
