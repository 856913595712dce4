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


def apply_platform_env(default: str | None = None) -> str | None:
    """Honor ``LTEAX_PLATFORM`` (e.g. ``cpu``); returns the forced platform
    or None if the ambient default is kept.  Call before any jax op runs.

    ``default`` applies when LTEAX_PLATFORM is unset — the offline file
    CLIs pass "cpu" (their small 1.4 MHz graphs are dispatch-latency-bound
    and the ambient axon backend rejects several of their eager/small-FFT
    ops; LTEAX_PLATFORM=tpu opts back in)."""
    plat = os.environ.get("LTEAX_PLATFORM") or default
    if plat and plat != "tpu":
        import jax
        jax.config.update("jax_platforms", plat)
    return plat or None


def run_with_cpu_fallback(fn, what: str = "computation"):
    """Run ``fn()``; if the ambient accelerator backend rejects the program
    (e.g. the axon TPU plugin raises UNIMPLEMENTED for small-FFT/eager
    graphs a CLI tool uses), retry once on the CPU backend.

    Only engages when the user did NOT force a platform via LTEAX_PLATFORM —
    an explicit choice should fail loudly."""
    import jax
    try:
        return fn()
    except Exception as e:  # backend errors surface as JaxRuntimeError
        if os.environ.get("LTEAX_PLATFORM"):
            raise
        if jax.default_backend() == "cpu":
            raise
        import sys
        print(f"note: {what} failed on the '{jax.default_backend()}' "
              f"backend ({type(e).__name__}); retrying on cpu "
              f"(set LTEAX_PLATFORM to silence)", file=sys.stderr)
        # the accelerator backend is already initialized, so flipping
        # jax_platforms is a no-op — scope the retry to the CPU device
        with jax.default_device(jax.devices("cpu")[0]):
            return fn()
