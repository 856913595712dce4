"""Spatial multiplexing (2x2): layer mapping, TM3/TM4 precoding, MMSE demix.

(reference capability: ``liblte/src/liblte_phy.cc :: layer_mapper`` /
``pre_coder`` / ``de_pre_coder`` — the reference implements 1-port and
SFBC TX diversity; open-loop (TM3, large-delay CDD) and closed-loop (TM4,
codebook) spatial multiplexing with two codewords extend beyond it.)

36.211 references:
- layer mapping for spatial multiplexing: §6.3.3.2 (2 codewords -> 2
  layers: one layer per codeword)
- precoding, large delay CDD: §6.3.4.2.2 — y(i) = W(i) D(i) U x(i); for
  2 layers W(i)=I/sqrt(2), U = [[1,1],[1,-1]]/sqrt(2), D(i) =
  diag(1, (-1)^i)
- precoding, codebook (closed loop): §6.3.4.2.1 + Table 6.3.4.2.3-2
  (2-antenna-port codebook)

All functions are jnp-traceable with static shapes; arrays are
RE-mapping-ordered with the RE axis last.

The receiver is a per-RE unbiased 2x2 MMSE demixer with exact post-MMSE
effective noise per layer, feeding the standard max-log demapper.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# 2-port codebook (36.211 Table 6.3.4.2.3-2)
# 1 layer: column vectors; 2 layers: matrices (index 0 = I/sqrt2; 3 is
# 1-layer-only)
CODEBOOK_2TX_1L = (
    np.array([1, 1], dtype=np.complex64) / np.sqrt(2),
    np.array([1, -1], dtype=np.complex64) / np.sqrt(2),
    np.array([1, 1j], dtype=np.complex64) / np.sqrt(2),
    np.array([1, -1j], dtype=np.complex64) / np.sqrt(2),
)
CODEBOOK_2TX_2L = (
    np.array([[1, 0], [0, 1]], dtype=np.complex64) / np.sqrt(2),
    np.array([[1, 1], [1, -1]], dtype=np.complex64) / 2.0,
    np.array([[1, 1], [1j, -1j]], dtype=np.complex64) / 2.0,
)

# fixed large-delay-CDD matrices for 2 layers
_U2 = np.array([[1, 1], [1, -1]], dtype=np.complex64) / np.sqrt(2)
_W2 = np.eye(2, dtype=np.complex64) / np.sqrt(2)


def layer_map_2cw(d0: jnp.ndarray, d1: jnp.ndarray) -> jnp.ndarray:
    """Two codewords -> two layers (36.211 §6.3.3.2): x (..., 2, M)."""
    return jnp.stack([d0, d1], axis=-2)


def _cdd_sign(n: int) -> np.ndarray:
    """(-1)^i sequence (the D(i) phase for 2 layers)."""
    return (1.0 - 2.0 * (np.arange(n) % 2)).astype(np.float32)


def precode_tm3(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Large-delay CDD, 2 layers -> 2 ports.  x (..., 2, M) -> (y0, y1).

    y(i) = W D(i) U x(i):  y0 = (x0+x1)/2,  y1 = (-1)^i (x0-x1)/2.
    """
    m = x.shape[-1]
    s = jnp.asarray(_cdd_sign(m))
    y0 = (x[..., 0, :] + x[..., 1, :]) * 0.5
    y1 = (x[..., 0, :] - x[..., 1, :]) * 0.5 * s
    return y0, y1


def precode_tm4(x: jnp.ndarray, cb_index: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-loop codebook precoding, 2 layers -> 2 ports.

    x (..., 2, M) -> (y0, y1), y = W x with W = CODEBOOK_2TX_2L[cb_index].
    """
    w = jnp.asarray(CODEBOOK_2TX_2L[cb_index])
    y = jnp.einsum("pk,...km->...pm", w, x)
    return y[..., 0, :], y[..., 1, :]


def precode_tm4_1layer(d: jnp.ndarray, cb_index: int):
    """Closed-loop rank-1 precoding: codeword (..., M) -> 2 port streams."""
    v = CODEBOOK_2TX_1L[cb_index]
    return d * v[0], d * v[1]


def heff_tm3(h: jnp.ndarray) -> jnp.ndarray:
    """Effective per-layer channel for TM3.

    h: (..., n_rx, 2, M) physical channel per (rx, tx port, RE).
    Returns (..., n_rx, 2 layers, M) effective channel H @ (W D(i) U):
    W D(i) U = 1/2 [[1, 1], [s_i, -s_i]] with s_i = (-1)^i, so
    col_layer0 = (h_p0 + s h_p1)/2, col_layer1 = (h_p0 - s h_p1)/2."""
    s = jnp.asarray(_cdd_sign(h.shape[-1]))
    hs1 = h[..., :, 1, :] * s
    m0 = (h[..., :, 0, :] + hs1) * 0.5
    m1 = (h[..., :, 0, :] - hs1) * 0.5
    return jnp.stack([m0, m1], axis=-2)


def heff_tm4(h: jnp.ndarray, cb_index: int) -> jnp.ndarray:
    """Effective per-layer channel for TM4: H @ W.  h (..., n_rx, 2, M)."""
    w = jnp.asarray(CODEBOOK_2TX_2L[cb_index])
    return jnp.einsum("...rtm,tk->...rkm", h, w)


def mmse_demix_2layers(y: jnp.ndarray, heff: jnp.ndarray, noise_var):
    """Per-RE unbiased 2x2 MMSE demix.

    y: (..., n_rx=2, M) received REs; heff: (..., n_rx=2, 2 layers, M).
    Returns (x_hat (..., 2, M), eff_nv (..., 2, M)) where eff_nv is the
    per-layer post-MMSE effective noise for unit-power constellations
    (eff_nv_k = (1 - b_k) / b_k with b_k the MMSE bias).

    Solved in closed form: A = H^H H + nv I (2x2 Hermitian), x_mmse =
    A^{-1} H^H y; bias b_k = [A^{-1} H^H H]_kk (real).
    """
    h0 = heff[..., :, 0, :]                 # (..., rx, M) layer-0 column
    h1 = heff[..., :, 1, :]
    nv = jnp.asarray(noise_var)
    # Gram entries (sum over rx)
    g00 = jnp.sum(jnp.abs(h0) ** 2, axis=-2) + nv
    g11 = jnp.sum(jnp.abs(h1) ** 2, axis=-2) + nv
    g01 = jnp.sum(jnp.conj(h0) * h1, axis=-2)
    det = g00 * g11 - jnp.abs(g01) ** 2
    det = jnp.maximum(det.real, 1e-24)
    # matched filter
    z0 = jnp.sum(jnp.conj(h0) * y, axis=-2)
    z1 = jnp.sum(jnp.conj(h1) * y, axis=-2)
    # A^{-1} z
    x0 = (g11 * z0 - g01 * z1) / det
    x1 = (g00 * z1 - jnp.conj(g01) * z0) / det
    # bias b_k = [A^{-1} H^H H]_kk = [I - nv A^{-1}]_kk
    b0 = 1.0 - nv * g11.real / det
    b1 = 1.0 - nv * g00.real / det
    b0 = jnp.maximum(b0, 1e-9)
    b1 = jnp.maximum(b1, 1e-9)
    x = jnp.stack([x0 / b0, x1 / b1], axis=-2)
    eff = jnp.stack([(1.0 - b0) / b0, (1.0 - b1) / b1], axis=-2)
    return x, jnp.maximum(eff, 1e-12)
