"""PUCCH: uplink control channel, formats 1/1a/1b and 2 (36.211 §5.4,
36.212 §5.2.3).

(reference capability: ``liblte/src/liblte_phy.cc :: liblte_phy_pucch_*``
format 1/1a/1b (+2) handling.)

PROVENANCE: the length-12 base-sequence phase table (36.211 Table 5.5.1.2-1)
and the RM(20,A) basis (36.212 Table 5.2.3.3-1) are reproduced from spec
memory (empty reference mount) — self-consistent encode/decode is the test
oracle; entries are [U]-tagged for the citation pass.
"""

from __future__ import annotations

import numpy as np

from lteax.phy import seq as seq_mod

# 36.211 Table 5.5.1.2-1: phi(n) for M_sc = 12, u = 0..29  [U]
PHI_M12 = (
    (-1, 1, 3, -3, 3, 3, 1, 1, 3, 1, -3, 3),
    (1, 1, 3, 3, 3, -1, 1, -3, -3, 1, -3, 3),
    (1, 1, -3, -3, -3, -1, -3, -3, 1, -3, 1, -1),
    (-1, 1, 1, 1, 1, -1, -3, -3, 1, -3, 3, -1),
    (-1, 3, 1, -1, 1, -1, -3, -1, 1, -1, 1, 3),
    (1, -3, 3, -1, -1, 1, 1, -1, -1, 3, -3, 1),
    (-1, 3, -3, -3, -3, 3, 1, -1, 3, 3, -3, 1),
    (-3, -1, -1, -1, 1, -3, 3, -1, 1, -3, 3, 1),
    (1, -3, 3, 1, -1, -1, -1, 1, 1, 3, -1, 1),
    (1, -3, -1, 3, 3, -1, -3, 1, 1, 1, 1, 1),
    (-1, 3, -1, 1, 1, -3, -3, -1, -3, -3, 3, -1),
    (3, 1, -1, -1, 3, 3, -3, 1, 3, 1, 3, 3),
    (1, -3, 1, 1, -3, 1, 1, 1, -3, -3, -3, 1),
    (3, 3, -3, 3, -3, 1, 1, 3, -1, -3, 3, 3),
    (-3, 1, -1, -3, -1, 3, 1, 3, 3, 3, -1, 1),
    (3, -1, 1, -3, -1, -1, 1, 1, 3, 1, -1, -3),
    (1, 3, 1, -1, 1, 3, 3, 3, -1, -1, 3, -1),
    (-3, 1, 1, 3, -3, 3, -3, -3, 3, 1, 3, -1),
    (-3, 3, 1, 1, -3, 1, -3, -3, -1, -1, 1, -3),
    (-1, 3, 1, 3, 1, -1, -1, 3, -3, -1, -3, -1),
    (-1, -3, 1, 1, 1, 1, 3, 1, -1, 1, -3, -1),
    (-1, 3, -1, 1, -3, -3, -3, -3, -3, 1, -1, -3),
    (1, 1, -3, -3, -3, -3, -1, 3, -3, 1, -3, 3),
    (1, 1, -1, -3, -1, -3, 1, -1, 1, 3, -1, 1),
    (1, 1, 3, 1, 3, 3, -1, 1, -1, -3, -3, 1),
    (1, -3, 3, 3, 1, 3, 3, 1, -3, -1, -1, 3),
    (1, 3, -3, -3, 3, -3, 1, -1, -1, 3, -1, -3),
    (-3, -1, -3, -1, -3, 3, 1, -1, 1, 3, -3, -3),
    (-1, 3, -3, 3, -1, 3, 3, -3, 3, 3, -1, -1),
    (3, -3, -3, -1, -1, -3, -1, 3, -3, 3, 1, -1),
)

# 36.212 Table 5.2.3.3-1: RM(20, A) basis sequences  [U]
RM_20_BASIS = np.array([
    [1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0],
    [1, 1, 1, 0, 0, 0, 0, 0, 0, 1, 1, 1, 0],
    [1, 0, 0, 1, 0, 0, 1, 0, 1, 1, 1, 1, 1],
    [1, 0, 1, 1, 0, 0, 0, 0, 1, 0, 1, 1, 1],
    [1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 1, 1, 1],
    [1, 1, 0, 0, 1, 0, 1, 1, 1, 0, 1, 1, 1],
    [1, 0, 1, 0, 1, 0, 1, 0, 1, 1, 1, 1, 1],
    [1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 1, 1, 1],
    [1, 1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 1, 1],
    [1, 0, 1, 1, 1, 0, 1, 0, 0, 1, 1, 1, 1],
    [1, 0, 1, 0, 0, 1, 1, 1, 0, 1, 1, 1, 1],
    [1, 1, 1, 0, 0, 1, 1, 0, 1, 0, 1, 1, 1],
    [1, 0, 0, 1, 0, 1, 0, 1, 1, 1, 1, 1, 1],
    [1, 1, 0, 1, 0, 1, 0, 1, 0, 1, 1, 1, 1],
    [1, 0, 0, 0, 1, 1, 0, 1, 0, 0, 1, 0, 1],
    [1, 1, 0, 0, 1, 1, 1, 1, 0, 1, 1, 0, 1],
    [1, 1, 1, 0, 1, 1, 1, 0, 0, 1, 0, 1, 1],
    [1, 0, 0, 1, 1, 1, 0, 0, 1, 0, 0, 1, 1],
    [1, 1, 0, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0],
], dtype=np.int64)

# format 1 orthogonal covers (normal CP): data W4 (Walsh), RS W3 (DFT)
W4 = np.array([[1, 1, 1, 1], [1, -1, 1, -1], [1, -1, -1, 1]],
              dtype=np.complex64)
W3 = np.array([[1, 1, 1],
               [1, np.exp(2j * np.pi / 3), np.exp(4j * np.pi / 3)],
               [1, np.exp(4j * np.pi / 3), np.exp(2j * np.pi / 3)]],
              dtype=np.complex64)

DATA_SYMS_F1 = (0, 1, 5, 6)   # within a slot, normal CP
RS_SYMS_F1 = (2, 3, 4)


def _r_alpha(n_cell_id: int, ns: int, alpha_idx: int) -> np.ndarray:
    u = n_cell_id % 30
    phi = np.asarray(PHI_M12[u])
    r = np.exp(1j * np.pi * phi / 4)
    n = np.arange(12)
    return (np.exp(1j * 2 * np.pi * alpha_idx * n / 12) * r).astype(np.complex64)


def pucch_format1_encode(bits: tuple[int, ...], n_cell_id: int, subframe: int,
                         alpha_idx: int = 0, oc_idx: int = 0) -> np.ndarray:
    """Formats 1/1a/1b -> (2, 7, 12) per-slot symbols (normal CP).

    bits: () = format 1 (SR, d=1); (b,) = 1a BPSK; (b0, b1) = 1b QPSK.
    """
    if len(bits) == 0:
        d = 1.0 + 0j
    elif len(bits) == 1:
        d = 1.0 - 2.0 * bits[0] + 0j
    else:
        d = ((1 - 2 * bits[0]) + 1j * (1 - 2 * bits[1])) / np.sqrt(2)
    out = np.zeros((2, 7, 12), dtype=np.complex64)
    for slot in range(2):
        ns = 2 * subframe + slot
        r = _r_alpha(n_cell_id, ns, alpha_idx)
        for i, sym in enumerate(DATA_SYMS_F1):
            out[slot, sym] = d * W4[oc_idx, i] * r
        for i, sym in enumerate(RS_SYMS_F1):
            out[slot, sym] = W3[oc_idx % 3, i] * r
    return out


def pucch_format1_decode(rx: np.ndarray, n_cell_id: int, subframe: int,
                         alpha_idx: int = 0, oc_idx: int = 0,
                         n_bits: int = 1):
    """rx (2, 7, 12) -> (bits tuple, soft metric).  Coherent: channel from
    the RS symbols, despread data symbols."""
    d_acc = 0.0 + 0j
    for slot in range(2):
        ns = 2 * subframe + slot
        r = _r_alpha(n_cell_id, ns, alpha_idx)
        h = 0.0 + 0j
        for i, sym in enumerate(RS_SYMS_F1):
            h += np.sum(rx[slot, sym] * np.conj(W3[oc_idx % 3, i] * r))
        h /= (3 * 12)
        for i, sym in enumerate(DATA_SYMS_F1):
            d_acc += np.sum(rx[slot, sym] * np.conj(W4[oc_idx, i] * r)
                            ) * np.conj(h)
    if n_bits == 0:
        return (), float(np.real(d_acc))
    if n_bits == 1:
        return (int(np.real(d_acc) < 0),), float(abs(np.real(d_acc)))
    b0 = int(np.real(d_acc) < 0)
    b1 = int(np.imag(d_acc) < 0)
    return (b0, b1), float(abs(d_acc))


# ---------------------------------------------------------------------------
# Format 2 (+ CQI on PUSCH): RM (20, A) block code
# ---------------------------------------------------------------------------

def rm20_encode(bits: np.ndarray) -> np.ndarray:
    """(A<=13,) -> (20,) per 36.212 §5.2.3.3."""
    a = len(bits)
    out = (RM_20_BASIS[:, :a] @ np.asarray(bits, dtype=np.int64)) % 2
    return out.astype(np.int32)


def rm20_decode(llrs: np.ndarray, a: int) -> tuple[np.ndarray, float]:
    """ML decode over 2^a codewords (a <= 13)."""
    msgs = np.arange(2 ** a)
    bits = ((msgs[:, None] >> np.arange(a)[None, :]) & 1)
    cws = (bits @ RM_20_BASIS[:, :a].T) % 2        # (2^a, 20)
    metric = (1 - 2 * cws) @ np.asarray(llrs)
    best = int(np.argmax(metric))
    return bits[best].astype(np.int32), float(metric[best])


def pucch_format2_encode(bits: np.ndarray, n_cell_id: int, subframe: int,
                         rnti: int, alpha_idx: int = 0) -> np.ndarray:
    """(A,) UCI bits -> (2, 7, 12) grid (normal CP: data on symbols
    0,2,3,4,6; RS on 1,5)."""
    coded = rm20_encode(bits)
    cinit = (2 * subframe + 1) * (2 * n_cell_id + 1) * 65536 + rnti
    c = seq_mod.gold_sequence_np(cinit, 20)
    scr = (coded + c) % 2
    d = ((1 - 2 * scr[0::2]) + 1j * (1 - 2 * scr[1::2])) / np.sqrt(2)  # (10,)
    out = np.zeros((2, 7, 12), dtype=np.complex64)
    data_syms = (0, 2, 3, 4, 6)
    k = 0
    for slot in range(2):
        ns = 2 * subframe + slot
        r = _r_alpha(n_cell_id, ns, alpha_idx)
        for sym in range(7):
            if sym in data_syms:
                out[slot, sym] = d[k] * r
                k += 1
            else:
                out[slot, sym] = r
    return out


def pucch_format2_decode(rx: np.ndarray, n_cell_id: int, subframe: int,
                         rnti: int, a: int, alpha_idx: int = 0):
    """rx (2, 7, 12) -> (uci bits, metric)."""
    data_syms = (0, 2, 3, 4, 6)
    d = np.zeros(10, dtype=np.complex64)
    k = 0
    for slot in range(2):
        ns = 2 * subframe + slot
        r = _r_alpha(n_cell_id, ns, alpha_idx)
        h = 0.0 + 0j
        for sym in (1, 5):
            h += np.sum(rx[slot, sym] * np.conj(r)) / 12
        h /= 2
        for sym in range(7):
            if sym in data_syms:
                d[k] = np.sum(rx[slot, sym] * np.conj(r)) / 12 * np.conj(h)
                k += 1
    llr = np.zeros(20, dtype=np.float32)
    llr[0::2] = np.real(d) * np.sqrt(2)
    llr[1::2] = np.imag(d) * np.sqrt(2)
    cinit = (2 * subframe + 1) * (2 * n_cell_id + 1) * 65536 + rnti
    c = seq_mod.gold_sequence_np(cinit, 20)
    llr *= (1.0 - 2.0 * c)
    return rm20_decode(llr, a)


# ---------------------------------------------------------------------------
# Formats 2a/2b (36.211 §5.4.2 Table 5.4.2-1): CQI as in format 2 plus 1-2
# HARQ-ACK bits modulating the SECOND RS symbol of each slot (symbol 5,
# normal CP).
# ---------------------------------------------------------------------------

# d(10) constellations: (ack bits) -> symbol  [U exact 2b mapping]
_D10_2A = ((1.0 + 0j, (0,)), (-1.0 + 0j, (1,)))
_D10_2B = ((1.0 + 0j, (0, 0)), (-1j, (0, 1)), (1j, (1, 0)), (-1.0 + 0j, (1, 1)))


def pucch_format2ab_encode(cqi_bits: np.ndarray, ack_bits: tuple[int, ...],
                           n_cell_id: int, subframe: int, rnti: int,
                           alpha_idx: int = 0) -> np.ndarray:
    """Format 2a (1 ACK bit) / 2b (2 ACK bits): format-2 grid with the
    second RS symbol in each slot rotated by d(10)."""
    table = _D10_2A if len(ack_bits) == 1 else _D10_2B
    d10 = next(d for d, b in table if b == tuple(ack_bits))
    out = pucch_format2_encode(cqi_bits, n_cell_id, subframe, rnti,
                               alpha_idx).copy()
    out[:, 5] *= d10
    return out


def pucch_format2ab_decode(rx: np.ndarray, n_cell_id: int, subframe: int,
                           rnti: int, a: int, n_ack: int,
                           alpha_idx: int = 0):
    """-> (cqi bits, ack bits, metric, ack_metric).  ACK is sliced from the
    second RS symbol against the first-RS channel estimate; the CQI decode
    then reuses both RS symbols with the ACK rotation removed.

    ``ack_metric`` = |acc| of the coherent RS correlation (≈2.0 at |h|=1);
    callers should treat a weak value as DTX (the UE sent plain format 2)
    rather than trust a noise-driven ACK slice."""
    acc = 0.0 + 0j
    for slot in range(2):
        ns = 2 * subframe + slot
        r = _r_alpha(n_cell_id, ns, alpha_idx)
        h1 = np.sum(rx[slot, 1] * np.conj(r)) / 12
        z5 = np.sum(rx[slot, 5] * np.conj(r)) / 12
        acc += z5 * np.conj(h1)
    table = _D10_2A if n_ack == 1 else _D10_2B
    d10, ack = max(table, key=lambda e: float(np.real(acc * np.conj(e[0]))))
    fixed = np.asarray(rx).copy()
    fixed[:, 5] = fixed[:, 5] * np.conj(d10)
    cqi, metric = pucch_format2_decode(fixed, n_cell_id, subframe, rnti, a,
                                       alpha_idx)
    return cqi, ack, metric, float(np.abs(acc))


# ---------------------------------------------------------------------------
# Grid mapping (36.211 §5.4.3): PUCCH region at the band edges with slot
# hopping — resource m occupies PRB m//2 at one edge in one slot and the
# mirrored PRB in the other.
# ---------------------------------------------------------------------------

def pucch_prb(m: int, slot: int, n_rb_ul: int) -> int:
    """PRB index of PUCCH resource m in the given slot (0/1)."""
    if (m + slot) % 2 == 0:
        return m // 2
    return n_rb_ul - 1 - m // 2


def pucch_map_format1(grid: np.ndarray, syms: np.ndarray, m: int,
                      n_rb_ul: int) -> np.ndarray:
    """Superpose (2, 7, 12) PUCCH symbols into a (14, n_rb_ul*12) UL grid.

    Additive so code-multiplexed resources (same m, different orthogonal
    cover / cyclic shift) can share a PRB pair, 36.211 §5.4.1 style."""
    g = np.asarray(grid).copy()
    for slot in range(2):
        prb = pucch_prb(m, slot, n_rb_ul)
        g[slot * 7:(slot + 1) * 7, prb * 12:(prb + 1) * 12] += syms[slot]
    return g


def pucch_extract(grid: np.ndarray, m: int, n_rb_ul: int) -> np.ndarray:
    """Gather PUCCH resource m back out of a (14, n_rb_ul*12) grid."""
    g = np.asarray(grid)
    out = np.zeros((2, 7, 12), dtype=np.complex64)
    for slot in range(2):
        prb = pucch_prb(m, slot, n_rb_ul)
        out[slot] = g[slot * 7:(slot + 1) * 7, prb * 12:(prb + 1) * 12]
    return out


def pucch_present(grid: np.ndarray, m: int, n_rb_ul: int,
                  thresh: float = 0.1) -> bool:
    """Energy detector: mean per-RE power on resource m above thresh."""
    res = pucch_extract(grid, m, n_rb_ul)
    return float(np.mean(np.abs(res) ** 2)) > thresh
