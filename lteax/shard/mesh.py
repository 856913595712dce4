"""Device mesh construction.

(reference reality: the reference has NO collective layer — pthread pipelines
and serial scanning (SURVEY.md §2.6).  Its scaling axes map to mesh axes:
C5 channel parallelism -> "chan"; C4 subframe/time-block data parallelism ->
"time".  Halos (C6) ride "time"; carriers shard across hosts on "chan" so
cross-host traffic carries zero halo.)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAN_AXIS = "chan"
TIME_AXIS = "time"


def make_mesh(n_chan: int = 1, n_time: int | None = None,
              devices=None) -> Mesh:
    """2D (chan, time) mesh.  Defaults: all devices on the time axis."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if n_time is None:
        n_time = len(devs) // n_chan
    if n_chan * n_time != len(devs):
        raise ValueError(f"{n_chan}x{n_time} mesh != {len(devs)} devices")
    return Mesh(devs.reshape(n_chan, n_time), (CHAN_AXIS, TIME_AXIS))


def time_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard array axis ``axis`` over the time mesh axis."""
    spec = [None] * ndim
    spec[axis] = TIME_AXIS
    return NamedSharding(mesh, P(*spec))


def chan_time_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Axis 0 -> chan, axis 1 -> time."""
    spec = [None] * ndim
    spec[0] = CHAN_AXIS
    spec[1] = TIME_AXIS
    return NamedSharding(mesh, P(*spec))
