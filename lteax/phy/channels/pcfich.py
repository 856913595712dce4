"""PCFICH: control format indicator channel (36.212 §5.3.4, 36.211 §6.7).

(reference capability: CFI handling inside ``liblte/src/liblte_phy.cc ::
liblte_phy_pdcch_channel_encode``/``_decode``.)
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from lteax.phy.mod import modulate
from lteax.phy import seq


@lru_cache(maxsize=None)
def cfi_codewords() -> np.ndarray:
    """(3, 32) int — 36.212 Table 5.3.4-1: CFI n -> repeated pattern."""
    base = {1: [0, 1, 1], 2: [1, 0, 1], 3: [1, 1, 0]}
    out = np.zeros((3, 32), dtype=np.int32)
    for cfi in (1, 2, 3):
        out[cfi - 1] = np.tile(base[cfi], 11)[:32]
    return out


def _c_init(n_cell_id: int, subframe: int) -> int:
    ns = 2 * subframe
    return (ns // 2 + 1) * (2 * n_cell_id + 1) * 512 + n_cell_id


def pcfich_encode(cfi: int, n_cell_id: int, subframe: int) -> jnp.ndarray:
    """-> (16,) QPSK symbols."""
    bits = jnp.asarray(cfi_codewords()[cfi - 1])
    c = jnp.asarray(seq.gold_sequence_np(_c_init(n_cell_id, subframe), 32))
    return modulate((bits + c) % 2, "qpsk")


def pcfich_decode(llrs: jnp.ndarray, n_cell_id: int, subframe: int):
    """llrs (32,) from the 16 PCFICH REs -> (cfi, score).

    Correlates descrambled LLRs against the three codewords."""
    sgn = jnp.asarray(
        (1.0 - 2.0 * seq.gold_sequence_np(_c_init(n_cell_id, subframe), 32))
        .astype(np.float32))
    d = llrs * sgn
    cw_sgn = jnp.asarray((1.0 - 2.0 * cfi_codewords()).astype(np.float32))
    scores = cw_sgn @ d
    cfi = jnp.argmax(scores) + 1
    return cfi, scores
