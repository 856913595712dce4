"""Channel-sharded scanner front-end (config #5).

Stage 1 of the pod-scale scanner: PSS detection metrics for ALL carriers in
one jitted, ``shard_map``-sharded call over the ``chan`` mesh axis — the
reference retunes one SDR serially (SURVEY §3.4); here carriers are data
parallelism.  Detected channels then go through the host-driven per-channel
decode (apps.file_scan.scan).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lteax.phy.config import PhyConfig
from lteax.phy.sync import pss_correlate
from lteax.shard.mesh import CHAN_AXIS, TIME_AXIS


def make_sharded_pss_detector(mesh, cfg: PhyConfig, capture_len: int,
                              threshold: float = 30.0):
    """-> jitted fn: (n_chan, L, 2) f32 IQ sharded over ``chan`` ->
    (detected (n_chan,) bool, n_id_2 (n_chan,), pss_idx (n_chan,),
     peak_ratio (n_chan,), n_detected_global scalar)."""

    def local(x_iq):
        x = (x_iq[..., 0] + 1j * x_iq[..., 1]).astype(jnp.complex64)
        p = pss_correlate(x, cfg)                     # (nc_local, 3, L)
        root_max = jnp.max(p, axis=-1)                # (nc_local, 3)
        nid2 = jnp.argmax(root_max, axis=-1)
        pr = jnp.take_along_axis(p, nid2[:, None, None], axis=1)[:, 0, :]
        peak = jnp.max(pr, axis=-1)
        idx = jnp.argmax(pr >= 0.9 * peak[:, None], axis=-1)
        mean = jnp.mean(p, axis=(-2, -1))
        ratio = peak / jnp.maximum(mean, 1e-20)
        det = ratio > threshold
        n_det = jax.lax.psum(jnp.sum(det.astype(jnp.int32)), CHAN_AXIS)
        n_det = jax.lax.psum(n_det, TIME_AXIS)
        return det, nid2.astype(jnp.int32), idx.astype(jnp.int32), ratio, n_det

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(CHAN_AXIS, None, None),),
                   out_specs=(P(CHAN_AXIS), P(CHAN_AXIS), P(CHAN_AXIS),
                              P(CHAN_AXIS), P()))
    return jax.jit(fn)


def batched_prescan(captures: np.ndarray, cfg: PhyConfig, mesh,
                    threshold: float = 30.0) -> list[dict]:
    """Host convenience: (n_chan, L) complex captures -> per-channel
    detection dicts.  Pads the channel count to the mesh size."""
    from lteax.io.iq import to_iq_f32
    n_chan, l = captures.shape
    n_shards = mesh.devices.shape[0]
    pad = (-n_chan) % n_shards
    x = np.concatenate([captures,
                        np.zeros((pad, l), captures.dtype)]) if pad else captures
    det = make_sharded_pss_detector(mesh, cfg, l, threshold)
    d, nid2, idx, ratio, n_det = det(jnp.asarray(to_iq_f32(x)))
    out = []
    for i in range(n_chan):
        out.append({"detected": bool(d[i]), "n_id_2": int(nid2[i]),
                    "pss_idx": int(idx[i]), "peak_ratio": float(ratio[i])})
    return out
