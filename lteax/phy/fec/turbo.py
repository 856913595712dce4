"""LTE turbo code: PCCC encoder + windowed max-log-MAP decoder (36.212 §5.1.3.2).

(reference capability: ``liblte/src/liblte_phy.cc :: turbo_encode`` /
``turbo_decode`` — sequential scalar C++ trellis loops.)

TPU-native design
-----------------
* Encoder: one ``lax.scan`` over K bits with a 3-bit register state,
  ``vmap``-batched over codeblocks.  Encoding is never the bottleneck.
* Decoder: **parallel sliding-window max-log-MAP**.  The trellis recursions
  are sequential in k, so throughput on a parallel machine must come from
  (a) batching over codeblocks and (b) splitting each block into windows
  decoded concurrently, with short acquisition warm-ups providing boundary
  metrics.  Sequential depth is O(W + ACQ) regardless of K; every scan step
  is an 8-state add-compare-select vectorized over
  (batch x n_windows x 8 states x 2 branches) — pure VPU work with
  compiler-friendly static shapes.  This is the standard high-throughput
  turbo architecture (cf. TTA/ASIC decoders, PAPERS.md) recast as JAX.

Trellis: RSC with g0 = 1 + D^2 + D^3 (feedback), g1 = 1 + D + D^3.
State s = (d1, d2, d3), d1 newest;  w = b ^ d2 ^ d3;  next = (w, d1, d2);
parity z = w ^ d1 ^ d3.  Termination: 3 tail steps with b = d2 ^ d3 per
constituent, 12 tail bits multiplexed per 36.212 §5.1.3.2.2.

LLR convention: L = log P(0)/P(1) (positive ⇒ bit 0).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from lteax.phy.tables.turbo_qpp import qpp_deinterleaver, qpp_interleaver

NEG = jnp.float32(-1e9)
N_TAIL_D = 4  # each of the 3 d-streams carries K+4 bits (12 tail bits total)


# ---------------------------------------------------------------------------
# Trellis tables
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _trellis():
    """Forward and backward trellis tables for the 8-state RSC."""
    ns = np.zeros((8, 2), dtype=np.int32)       # next state
    psign = np.zeros((8, 2), dtype=np.float32)  # 1 - 2*parity
    for s in range(8):
        d1, d2, d3 = (s >> 2) & 1, (s >> 1) & 1, s & 1
        for b in range(2):
            w = b ^ d2 ^ d3
            z = w ^ d1 ^ d3
            ns[s, b] = (w << 2) | (d1 << 1) | d2
            psign[s, b] = 1.0 - 2.0 * z
    # predecessors: prev[s', t] for t in {0,1}; input bit & parity sign of the
    # incoming branch.
    prev = np.zeros((8, 2), dtype=np.int32)
    in_ssign = np.zeros((8, 2), dtype=np.float32)
    in_psign = np.zeros((8, 2), dtype=np.float32)
    for sp in range(8):
        cands = [(s, b) for s in range(8) for b in range(2) if ns[s, b] == sp]
        assert len(cands) == 2
        for t, (s, b) in enumerate(cands):
            prev[sp, t] = s
            in_ssign[sp, t] = 1.0 - 2.0 * b
            in_psign[sp, t] = psign[s, b]
    ssign = np.array([[1.0, -1.0]] * 8, dtype=np.float32)  # 1-2b, per (s, b)
    return ns, ssign, psign, prev, in_ssign, in_psign


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _rsc_encode(bits: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One RSC constituent.  bits (K,) -> (parity (K,), x_tail (3,), z_tail (3,))."""

    def step(s, b):
        d1, d2, d3 = (s >> 2) & 1, (s >> 1) & 1, s & 1
        w = b ^ d2 ^ d3
        z = w ^ d1 ^ d3
        return (w << 2) | (d1 << 1) | d2, z

    s_end, parity = jax.lax.scan(step, jnp.int32(0), bits.astype(jnp.int32))

    def tail_step(s, _):
        d1, d2, d3 = (s >> 2) & 1, (s >> 1) & 1, s & 1
        b = d2 ^ d3            # forces w = 0
        z = 0 ^ d1 ^ d3
        return (d1 << 1) | d2, (b, z)

    _, (x_tail, z_tail) = jax.lax.scan(tail_step, s_end, None, length=3)
    return parity, x_tail, z_tail


def turbo_encode(bits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Encode one codeblock.  bits (K,) -> d (3, K+4) streams per 36.212:

    d0 = systematic + [x_K,  z'_{K+1}, x'_K,  z'_... ] tail multiplexing:
      d0[K..K+3] = x_K,   z_{K+1}, x'_K,   z'_{K+1}
      d1[K..K+3] = z_K,   x_{K+2}, z'_K,   x'_{K+2}
      d2[K..K+3] = x_{K+1}, z_{K+2}, x'_{K+1}, z'_{K+2}
    """
    bits = bits.astype(jnp.int32)
    pi = jnp.asarray(qpp_interleaver(k))
    p1, xt1, zt1 = _rsc_encode(bits)
    p2, xt2, zt2 = _rsc_encode(bits[pi])
    d0 = jnp.concatenate([bits, jnp.stack([xt1[0], zt1[1], xt2[0], zt2[1]])])
    d1 = jnp.concatenate([p1, jnp.stack([zt1[0], xt1[2], zt2[0], xt2[2]])])
    d2 = jnp.concatenate([p2, jnp.stack([xt1[1], zt1[2], xt2[1], zt2[2]])])
    return jnp.stack([d0, d1, d2])


turbo_encode_batch = jax.vmap(turbo_encode, in_axes=(0, None))


# ---------------------------------------------------------------------------
# Windowed max-log-MAP half-iteration
# ---------------------------------------------------------------------------

def _n_windows(n: int, win: int) -> int:
    return -(-n // win)


def _fused_sweeps(u: jnp.ndarray, v: jnp.ndarray, win: int, acq: int,
                  a_init=None, b_init=None):
    """Forward AND backward metrics in ONE scan (halves sequential steps —
    the decoder is latency-bound on TPU, not compute-bound).

    ``a_init``/``b_init`` (n_w, 8): window-boundary metrics from the
    previous turbo iteration (NII — next-iteration initialization).  With
    NII the short acquisition suffices even for heavily punctured
    high-rate transmissions, where cold uniform starts fail.

    Returns (alphas (N, 8) = alpha_k before step k,
             betas  (N, 8) = beta_{k+1} aligned to step k,
             a_end (n_w, 8) = alpha at each window's right boundary,
             b_end (n_w, 8) = beta at each window's left boundary)."""
    ns, ssign, psign, prev, in_ss, in_ps = _trellis()
    ns_j = jnp.asarray(ns)
    ssign_j, psign_j = jnp.asarray(ssign), jnp.asarray(psign)
    prev_j = jnp.asarray(prev)
    in_ss_j, in_ps_j = jnp.asarray(in_ss), jnp.asarray(in_ps)

    n = u.shape[0]
    n_w = _n_windows(n, win)
    total = acq + win

    # alpha geometry: window w, step t -> position w*win - acq + t
    pos_a = (jnp.arange(n_w)[:, None] * win - acq + jnp.arange(total)[None, :])
    # beta geometry: backward from (w+1)*win + acq - 1
    pos_b = ((jnp.arange(n_w)[:, None] + 1) * win + acq - 1
             - jnp.arange(total)[None, :])

    def gather(pos):
        valid = (pos >= 0) & (pos < n)
        pc = jnp.clip(pos, 0, n - 1)
        return (jnp.where(valid, u[pc], 0.0).T, jnp.where(valid, v[pc], 0.0).T,
                (~valid).T)       # (total, n_w) each

    ua, va, fza = gather(pos_a)
    ub, vb, fzb = gather(pos_b)

    a0 = jnp.full((n_w, 8), 0.0, dtype=u.dtype) if a_init is None else a_init
    a0 = a0.at[0].set(jnp.full((8,), NEG).at[0].set(0.0))  # exact start
    b0 = jnp.full((n_w, 8), 0.0, dtype=u.dtype) if b_init is None else b_init
    b0 = b0.at[n_w - 1].set(jnp.full((8,), NEG).at[0].set(0.0))  # termination
    a0 = a0 + 0.0 * u[0]
    b0 = b0 + 0.0 * u[0]

    # gather-free trellis wiring (this trellis is a radix-2 butterfly):
    #  * predecessors of new state s' are ((s'&3)<<1 | t): a reshape+tile
    #  * successors of s are {s>>1, 4+(s>>1)} picked by parity p(s)=d2^d3
    p_mask = jnp.asarray(np.array([(s >> 1 & 1) ^ (s & 1) for s in range(8)],
                                  dtype=bool))

    def step(carry, inp):
        a, b = carry
        uu_a, vv_a, fz_a, uu_b, vv_b, fz_b = inp
        # forward ACS: pairs (a[2j], a[2j+1]) feed new states j and j+4
        g_a = 0.5 * (in_ss_j[None] * uu_a[:, None, None]
                     + in_ps_j[None] * vv_a[:, None, None])
        e = a.reshape(-1, 4, 2)
        cand = jnp.concatenate([e, e], axis=1) + g_a      # (n_w, 8, 2)
        a_new = jnp.max(cand, axis=-1)
        a_next = jnp.where(fz_a[:, None], a, a_new)
        # backward ACS
        g_b = 0.5 * (ssign_j[None] * uu_b[:, None, None]
                     + psign_j[None] * vv_b[:, None, None])
        low = jnp.repeat(b[:, 0:4], 2, axis=1)            # beta[s>>1]
        high = jnp.repeat(b[:, 4:8], 2, axis=1)           # beta[4+(s>>1)]
        sel0 = jnp.where(p_mask, high, low)               # input bit 0: w=p(s)
        sel1 = jnp.where(p_mask, low, high)
        cand_b = jnp.stack([sel0, sel1], axis=-1) + g_b
        b_new = jnp.max(cand_b, axis=-1)
        b_next = jnp.where(fz_b[:, None], b, b_new)
        return (a_next, b_next), (a, b)

    (a_fin, b_fin), (alphas, betas_in) = jax.lax.scan(
        step, (a0, b0), (ua, va, fza, ub, vb, fzb))
    # alphas[t] = alpha before step pos_a[:, t]; window part ascending k
    alphas = alphas[acq:]
    alphas = jnp.moveaxis(alphas, 0, 1).reshape(n_w * win, 8)[:n]
    # betas_in[t] = beta before processing step pos_b[:, t] == beta_{pos+1}
    betas_in = betas_in[acq:][::-1]
    betas_in = jnp.moveaxis(betas_in, 0, 1).reshape(n_w * win, 8)[:n]
    # final carries: a_fin[w] = alpha_{(w+1)*win}, b_fin[w] = beta_{w*win}
    return alphas, betas_in, a_fin, b_fin


def _half_iteration(u, v, win, acq, inits=None):
    """Max-log-MAP half-iteration.  u = Ls+La (N,), v = Lp (N,).

    Returns (full APP LLRs L (N,), next-iteration window inits)."""
    ns, ssign, psign, _, _, _ = _trellis()
    ns_j = jnp.asarray(ns)
    ssign_j, psign_j = jnp.asarray(ssign), jnp.asarray(psign)

    a_init, b_init = (None, None) if inits is None else inits
    alphas, betas, a_fin, b_fin = _fused_sweeps(u, v, win, acq,
                                                a_init, b_init)
    gamma = 0.5 * (ssign_j[None] * u[:, None, None]
                   + psign_j[None] * v[:, None, None])       # (N, 8, 2)
    metric = alphas[:, :, None] + gamma + jnp.take(betas, ns_j.reshape(-1),
                                                   axis=1).reshape(-1, 8, 2)
    l0 = jnp.max(metric[..., 0], axis=-1)
    l1 = jnp.max(metric[..., 1], axis=-1)
    # NII: next iteration's window w begins its acquisition at position
    # w*win - acq (alpha) / (w+1)*win + acq - 1 (beta, exclusive) — seed it
    # with THIS iteration's metrics at exactly those positions.
    n = u.shape[0]
    n_w = _n_windows(n, win)
    w_idx = jnp.arange(n_w)
    a_pos = jnp.clip(w_idx * win - acq, 0, n - 1)
    b_pos = jnp.clip((w_idx + 1) * win + acq - 1, 0, n - 1)
    a_next = alphas[a_pos]               # alpha_{w*win - acq}
    b_next = betas[b_pos]                # beta_{pos+1}
    a_next = a_next - jnp.max(a_next, axis=-1, keepdims=True)
    b_next = b_next - jnp.max(b_next, axis=-1, keepdims=True)
    return l0 - l1, (a_next, b_next)


def turbo_decode(llr_d: jnp.ndarray, k: int, n_iter: int = 8,
                 win: int = 32, acq: int = 16,
                 ext_scale: float = 0.75) -> jnp.ndarray:
    """Max-log-MAP turbo decode of one codeblock.

    llr_d: (3, K+4) channel LLRs for streams d0/d1/d2 (output of rate
    de-matching; zeros where bits were never transmitted).
    Returns (K,) hard bits.  ``ext_scale`` is the standard scaled-extrinsic
    correction for max-log-MAP (~0.7-0.75 recovers most of full-MAP).
    """
    pi = jnp.asarray(qpp_interleaver(k))
    inv = jnp.asarray(qpp_deinterleaver(k))
    d0, d1, d2 = llr_d[0], llr_d[1], llr_d[2]
    ls = d0[:k]
    lp1 = d1[:k]
    lp2 = d2[:k]
    # tail LLRs (36.212 §5.1.3.2.2 multiplexing — see turbo_encode docstring)
    sys_t1 = jnp.stack([d0[k], d2[k], d1[k + 1]])
    par_t1 = jnp.stack([d1[k], d0[k + 1], d2[k + 1]])
    sys_t2 = jnp.stack([d0[k + 2], d2[k + 2], d1[k + 3]])
    par_t2 = jnp.stack([d1[k + 2], d0[k + 3], d2[k + 3]])

    ls_int = ls[pi]
    u1_tail = sys_t1
    u2_tail = sys_t2
    v1 = jnp.concatenate([lp1, par_t1])
    v2 = jnp.concatenate([lp2, par_t2])

    n_w = _n_windows(k + 3, win)
    zero = jnp.zeros((n_w, 8), ls.dtype) + 0.0 * ls[0]  # mesh-varying type
    zero_init = (zero, zero)

    def body(carry, _):
        le21, inits1, inits2 = carry
        la1 = le21                                   # natural order
        u1 = jnp.concatenate([ls + la1, u1_tail])
        l1, inits1 = _half_iteration(u1, v1, win, acq, inits1)
        l1 = l1[:k]
        le12 = ext_scale * (l1 - ls - la1)
        la2 = le12[pi]
        u2 = jnp.concatenate([ls_int + la2, u2_tail])
        l2, inits2 = _half_iteration(u2, v2, win, acq, inits2)
        l2 = l2[:k]
        le21_int = ext_scale * (l2 - ls_int - la2)
        le21_new = le21_int[inv]
        l_total = (l2)[inv]
        return (le21_new, inits1, inits2), l_total

    (_, _, _), l_hist = jax.lax.scan(
        body, (jnp.zeros_like(ls), zero_init, zero_init), None, length=n_iter)
    l_final = l_hist[-1]
    return (l_final < 0).astype(jnp.int32)


def turbo_decode_batch(llr_d: jnp.ndarray, k: int, n_iter: int = 8,
                       win: int = 32, acq: int = 16) -> jnp.ndarray:
    """(C, 3, K+4) -> (C, K)."""
    return jax.vmap(lambda x: turbo_decode(x, k, n_iter, win, acq))(llr_d)
