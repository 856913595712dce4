"""lteax — a TPU-native LTE FDD PHY framework (JAX / XLA / Pallas).

Brand-new implementation of the capabilities of mgp25/OpenLTE's ``liblte_phy``
(reference: ``liblte/src/liblte_phy.cc``) plus the host-side stack codecs the
downlink scanner path needs (``liblte_rrc``/``liblte_mme``/``liblte_security``
subsets).  This is NOT a port: the dataplane is pure-functional, statically
shaped, batched, ``jit``-compiled JAX with Pallas kernels for the hot loops,
sharded over a ``jax.sharding.Mesh`` for multi-chip / multi-host scaling.

Package layout (see SURVEY.md §7):
  phy/      PhyConfig, 36.211/212/213 tables, sequences, OFDM, sync,
            channel estimation, modulation, FEC, physical channel codecs
  kernels/  Pallas TPU kernels (turbo max-log-MAP, correlators, ...)
  shard/    mesh definitions, overlap-save halo exchange, sharded pipelines
  io/       IQ sample stream readers/writers
  stack/    host-side control-plane codecs (RRC MIB/SIBs, bands, security)
  apps/     file_gen / file_scan / scanner applications
  sim/      AWGN + fading channel simulators for tests/benches
"""

__version__ = "0.1.0"

# Honor LTEAX_PLATFORM before any submodule builds device constants at
# import time (the ambient axon plugin ignores JAX_PLATFORMS from the env;
# selection must happen in-process before first backend use — see
# lteax/utils/platform.py).
from lteax.utils.platform import apply_platform_env as _apply_platform_env

_apply_platform_env()
