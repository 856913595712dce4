"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths (mesh/halo/ppermute) are exercised without TPU hardware
(SURVEY.md §4).

The ambient environment pins JAX to the single real TPU chip via an ``axon``
PJRT plugin registered in ``sitecustomize`` (which overrides JAX_PLATFORMS),
so we must force CPU *after* importing jax.  Set LTEAX_TEST_TPU=1 to run the
suite on the real chip instead.
"""

import os

if not os.environ.get("LTEAX_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
