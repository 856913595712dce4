"""Minimized repro for the structured-de-match x Pallas worker crash.

KNOWN_ISSUES.md: composing the structured (slice/concat) rate de-match
graph with the Pallas turbo kernel in ONE jit program crashes the TPU
worker on the axon backend; each half standalone is fine, and the
two-program split (shard/pipeline.py) works and is the production default.

This script runs a minimization ladder, each level in a SUBPROCESS so a
worker crash is contained and every level reports:

  L0 control   : contiguous input -> Pallas turbo            (expected OK)
  L1 minimal   : strided-slice/concat assembly of the same
                 values -> SAME jit program -> Pallas turbo  (suspect)
  L2 production: structured soft_dematch -> reshape -> Pallas
                 turbo, one jit program (the original repro)

If L1 crashes while L0 passes, the trigger is purely the slice/concat
feeding Mosaic — file/track as a backend bug.  When ALL levels pass, the
backend is fixed: flip LTEAX_STRUCT_DEMATCH default on and delete the
KNOWN_ISSUES entry (tests/test_struct_dematch_retest.py automates the
check).

Usage: python scripts/repro_struct_dematch.py  [--level N]  (real chip)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = {
    0: "control: contiguous -> pallas turbo",
    1: "minimal: slice/concat -> pallas turbo (one program)",
    2: "production: structured soft_dematch -> pallas (one program)",
}


def run_level(level: int) -> None:
    from lteax.utils.platform import apply_platform_env
    apply_platform_env()                  # LTEAX_PLATFORM=cpu -> interpret
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lteax.kernels.turbo_mlm import turbo_decode_batch_pallas
    from lteax.phy.fec.turbo import turbo_encode_batch
    from lteax.phy.fec.crc import attach_crc_np

    interp = jax.default_backend() == "cpu"
    k, c = 6144, 4
    rng = np.random.default_rng(0)
    msgs = np.stack([attach_crc_np(rng.integers(0, 2, k - 24), "24B")
                     for _ in range(c)])
    enc = np.asarray(turbo_encode_batch(jnp.asarray(msgs), k))  # (C,3,K+4)
    llr = (8.0 * (1.0 - 2.0 * enc)).astype(np.float32)
    d_len = k + 4

    if level == 0:
        x = jnp.asarray(llr)

        def prog(v):
            return turbo_decode_batch_pallas(v, k, n_iter=2,
                                             interpret=interp)
        fn = jax.jit(prog)
        bits = np.asarray(fn(x))
    elif level == 1:
        # position-interleave the d-streams into one flat buffer (row
        # pos*3+stream), then re-assemble inside the SAME program with
        # STRIDED slices + stack — the minimal shape of what the
        # structured de-match emits
        flat = jnp.asarray(
            np.ascontiguousarray(llr.transpose(2, 1, 0))     # (D, 3, C)
            .reshape(3 * d_len, c).reshape(-1))

        def prog(v):
            m = v.reshape(3 * d_len, c)
            parts = [m[s::3] for s in range(3)]         # strided slices
            d = jnp.stack(parts, axis=0)                # (3, D, C)
            d = jnp.moveaxis(d, -1, 0)                  # (C, 3, D)
            return turbo_decode_batch_pallas(d, k, n_iter=2,
                                             interpret=interp)
        fn = jax.jit(prog)
        bits = np.asarray(fn(flat))
    else:
        os.environ["LTEAX_STRUCT_DEMATCH"] = "1"
        from lteax.phy.channels import pdsch as pdsch_mod
        geom = pdsch_mod.pdsch_geometry(
            75376, 11988, 6, 0)             # 20 MHz MCS28-class geometry
        g = rng.standard_normal(geom.g).astype(np.float32)

        def prog(v):
            d = pdsch_mod.soft_dematch(v, geom)
            flat = d.reshape(geom.info.c, 3, geom.k + 4)
            return turbo_decode_batch_pallas(flat, geom.k, n_iter=1,
                                             interpret=interp)
        fn = jax.jit(prog)
        bits = np.asarray(fn(jnp.asarray(g)))

    if level in (0, 1):
        assert (bits == msgs).all(), "decode mismatch"
    print(f"LEVEL {level} OK: {LEVELS[level]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=None,
                    help="run one level inline (used by the subprocess)")
    args = ap.parse_args()
    if args.level is not None:
        run_level(args.level)
        return
    results = {}
    for lvl in sorted(LEVELS):
        r = subprocess.run([sys.executable, __file__, "--level", str(lvl)],
                           capture_output=True, text=True, timeout=1200)
        ok = r.returncode == 0
        results[lvl] = ok
        tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        print(f"[{'PASS' if ok else 'FAIL'}] L{lvl} {LEVELS[lvl]}")
        if not ok:
            for ln in tail:
                print("   ", ln)
    if all(results.values()):
        print("\nALL LEVELS PASS — backend fixed? Flip the "
              "LTEAX_STRUCT_DEMATCH default and drop the KNOWN_ISSUES "
              "entry (see tests/test_struct_dematch_retest.py).")
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()
