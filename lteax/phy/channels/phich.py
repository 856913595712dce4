"""PHICH: HARQ indicator channel (36.212 §5.3.5, 36.211 §6.9), normal
duration / normal CP.

(reference capability: the PHICH handling inside
``liblte/src/liblte_phy.cc :: liblte_phy_pdcch_channel_encode`` /
``_decode`` paths.)

Each PHICH group carries up to 8 ACK/NACK bits code-multiplexed with
length-4 orthogonal sequences (4 real + 4 imaginary), spread over 12 REs
(3 REGs in symbol 0).  Encoding superposes all PHICHs of a group; decoding
despreads with the conjugate sequence.
"""

from __future__ import annotations

import numpy as np

from lteax.phy import seq

N_SF = 4
_W_REAL = np.array([
    [1, 1, 1, 1],
    [1, -1, 1, -1],
    [1, 1, -1, -1],
    [1, -1, -1, 1],
], dtype=np.complex64)
W_SEQS = np.concatenate([_W_REAL, 1j * _W_REAL])      # (8, 4)


def _c_init(n_cell_id: int, subframe: int) -> int:
    ns = 2 * subframe
    return (ns // 2 + 1) * (2 * n_cell_id + 1) * 512 + n_cell_id


def phich_group_encode(acks: dict[int, int], n_cell_id: int,
                       subframe: int) -> np.ndarray:
    """acks: {n_seq (0..7): harq bit (1 = ACK)} -> (12,) superposed symbols."""
    c = seq.gold_sequence_np(_c_init(n_cell_id, subframe), 12)
    scr = (1.0 - 2.0 * c).astype(np.complex64)
    out = np.zeros(12, dtype=np.complex64)
    for n_seq, bit in acks.items():
        # HI bit b (1 = ACK), BPSK per 36.211 §7.1.1: (1-2b)(1+j)/sqrt(2)
        z = np.complex64((1 - 2 * bit) * (1 + 1j) / np.sqrt(2))
        out += np.tile(W_SEQS[n_seq], 3) * scr * z
    return out


def phich_group_decode(re_vals: np.ndarray, n_cell_id: int, subframe: int,
                       n_seq: int) -> float:
    """Despread one PHICH: -> soft metric for the HI bit
    (positive = bit 0 = NACK, negative = bit 1 = ACK; LLR convention)."""
    c = seq.gold_sequence_np(_c_init(n_cell_id, subframe), 12)
    scr = (1.0 - 2.0 * c).astype(np.complex64)
    w = np.tile(W_SEQS[n_seq], 3)
    corr = np.sum(np.asarray(re_vals) * np.conj(w * scr))
    return float(np.real(corr * np.conj(np.complex64(1 + 1j))) / np.sqrt(2))
