"""Rate matching for turbo and convolutional codes (36.212 §5.1.4).

(reference capability: ``liblte/src/liblte_phy.cc :: rate_match_turbo``,
``rate_unmatch_turbo``, ``rate_match_conv``, ``rate_unmatch_conv`` — nested
C++ loops building the sub-block interleaver and walking the circular buffer
bit by bit.)

TPU-native design: the whole pipeline (dummy-padding, sub-block interleaving,
circular-buffer collection, NULL skipping, redundancy-version offset) is a
fixed permutation for a given (D, E, rv).  We precompute ONE index vector on
host:  ``e = d_flat[idx]`` for matching, and rate *de*-matching with soft
combining of repeated bits is one ``scatter-add``:
``llr_d = zeros(3D).at[idx].add(e_llrs)``.  No device control flow at all.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

# Table 5.1.4-1 (turbo) inter-column permutation, 32 columns
PERM_TURBO = np.array(
    [0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30,
     1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31],
    dtype=np.int64)
# Table 5.1.4-2 (convolutional)
PERM_CONV = np.array(
    [1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31,
     0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30],
    dtype=np.int64)

_C = 32  # sub-block interleaver columns


def _subblock_col_read(d_len: int, perm: np.ndarray) -> np.ndarray:
    """Positions into the ND-padded stream for column-wise readout.

    y = [NULL]*ND + d written row-wise into (R, 32); columns permuted by
    ``perm``; read column-wise.  Returns (R*32,) indices into y."""
    r = -(-d_len // _C)
    cols = np.repeat(perm, r)          # column index per output position
    rows = np.tile(np.arange(r), _C)
    return rows * _C + cols


@lru_cache(maxsize=None)
def turbo_rm_indices(d_len: int, e_len: int, rv: int,
                     n_cb: int | None = None) -> np.ndarray:
    """Index vector idx (E,) into flat d (3*D) implementing 36.212 §5.1.4.1.

    d layout: [d0 | d1 | d2], each D = K+4 bits.
    """
    D = d_len
    R = -(-D // _C)
    Kp = R * _C
    ND = Kp - D
    v01 = _subblock_col_read(D, PERM_TURBO)                    # streams 0, 1
    k_arr = np.arange(Kp, dtype=np.int64)
    v2 = (PERM_TURBO[k_arr // R] + _C * (k_arr % R) + 1) % Kp  # stream 2
    # w -> flat-d map (−1 == NULL)
    w2d = np.full(3 * Kp, -1, dtype=np.int64)
    w2d[:Kp] = np.where(v01 >= ND, v01 - ND, -1)
    w2d[Kp::2] = np.where(v01 >= ND, D + v01 - ND, -1)
    w2d[Kp + 1::2] = np.where(v2 >= ND, 2 * D + v2 - ND, -1)
    Kw = 3 * Kp
    ncb = Kw if n_cb is None else min(n_cb, Kw)
    k0 = R * (2 * (-(-ncb // (8 * R))) * rv + 2)
    order = (k0 + np.arange(ncb)) % ncb
    valid = order[w2d[order] >= 0]
    idx = w2d[valid[np.arange(e_len) % len(valid)]]
    return idx.astype(np.int32)


@lru_cache(maxsize=None)
def conv_rm_indices(d_len: int, e_len: int) -> np.ndarray:
    """Index vector idx (E,) into flat d (3*D) per 36.212 §5.1.4.2."""
    D = d_len
    R = -(-D // _C)
    Kp = R * _C
    ND = Kp - D
    v = _subblock_col_read(D, PERM_CONV)
    w2d = np.concatenate([
        np.where(v >= ND, s * D + v - ND, -1) for s in range(3)
    ])
    order = np.arange(3 * Kp)
    valid = order[w2d[order] >= 0]
    idx = w2d[valid[np.arange(e_len) % len(valid)]]
    return idx.astype(np.int32)


# ---------------------------------------------------------------------------
# Device ops (jittable, batched over leading axes)
# ---------------------------------------------------------------------------

def rate_match(d: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """d (..., 3, D) encoded streams -> e (..., E) transmitted bits."""
    flat = d.reshape(*d.shape[:-2], -1)
    return flat[..., jnp.asarray(idx)]


def rate_unmatch(e_llrs: jnp.ndarray, idx: np.ndarray, d_len: int) -> jnp.ndarray:
    """e_llrs (..., E) -> d LLRs (..., 3, D); repeats soft-combine via add."""
    out = jnp.zeros((*e_llrs.shape[:-1], 3 * d_len), dtype=e_llrs.dtype)
    out = out.at[..., jnp.asarray(idx)].add(e_llrs)
    return out.reshape(*e_llrs.shape[:-1], 3, d_len)
