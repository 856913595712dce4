"""Backend selection for CLI apps.

The ambient environment pins the axon TPU plugin and ignores
``JAX_PLATFORMS`` set in the env (the plugin registers itself from
``sitecustomize``), so platform choice must happen *after* importing jax.
``LTEAX_PLATFORM=cpu`` forces the host backend — the right default escape
hatch when the remote-TPU tunnel is down and for small control-plane tools
(1.4 MHz gen/scan) where dispatch latency dominates.
"""

from __future__ import annotations

import os


def apply_platform_env() -> str | None:
    """Honor ``LTEAX_PLATFORM`` (e.g. ``cpu``); returns the forced platform
    or None if the ambient default is kept.  Call before any jax op runs."""
    plat = os.environ.get("LTEAX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    return plat or None
