"""Scaling benchmark: samples/s of the sharded PRODUCTION decode (Pallas
kernel + early stop + shard-local compacted retry) vs device count
(north star: >=80% efficiency 1 chip -> N).

On a multi-chip host this measures real ICI scaling of the path that ships;
on the single tunneled chip (or CPU) it records the 1-device baseline the
pod runs compare against.  ``--xla-turbo`` benches the slow XLA-scan
reference decoder instead (the pre-r3 behavior).

    python bench/scaling.py [--n-rb 100] [--mcs 28] [--per-dev 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rb", type=int, default=100)
    ap.add_argument("--mcs", type=int, default=28)
    ap.add_argument("--xla-turbo", action="store_true",
                    help="bench the XLA-scan reference decoder instead")
    ap.add_argument("--acquire", action="store_true",
                    help="bench the composed halo-PSS + decode pipeline")
    ap.add_argument("--per-dev", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force 8 virtual CPU devices")
    a = ap.parse_args()
    if a.cpu:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from lteax.phy.config import PhyConfig
    from lteax.phy import seq
    from lteax.phy.grid import crs_flat_idx, crs_symbols, pdsch_flat_idx
    from lteax.phy.ofdm import subframe_to_samples
    from lteax.phy.channels import pdsch as pdsch_mod
    from lteax.phy.tables.tbs import get_tbs_for_mcs
    from lteax.shard.mesh import make_mesh
    from lteax.shard.pipeline import (make_sharded_decoder,
                                      make_sharded_decoder_pallas,
                                      make_sharded_acquire_decoder_pallas)
    from lteax.io.iq import to_iq_f32

    cfg = PhyConfig(n_rb_dl=a.n_rb)
    cid, sf, rnti, cfi = 214, 1, 0x1234, 1 if a.n_rb > 10 else 2
    ctrl = cfi if a.n_rb > 10 else cfi + 1
    prbs = tuple(range(a.n_rb))
    tbs, scheme = get_tbs_for_mcs(a.mcs, a.n_rb)
    re_idx = pdsch_flat_idx(cfg, cid, ctrl, prbs, sf)
    qm = {"qpsk": 2, "16qam": 4, "64qam": 6}[scheme]
    geom = pdsch_mod.pdsch_geometry(tbs, len(re_idx), qm, 0)
    rng = np.random.default_rng(0)

    n_dev_all = len(jax.devices())
    results = []
    cpu = jax.devices()[0] if a.cpu else jax.devices("cpu")[0]
    # build per-device batch once (replicated across device counts)
    with jax.default_device(cpu):
        tb = rng.integers(0, 2, size=(a.per_dev, tbs)).astype(np.int32)
        cbs = np.stack([pdsch_mod.pdsch_prepare_cbs(tb[i], geom)
                        for i in range(a.per_dev)])
        enc = jax.jit(jax.vmap(lambda cb: pdsch_mod.pdsch_encode_cbs(
            cb, geom, rnti, sf, cid, scheme)), device=cpu)
        syms = np.asarray(enc(jnp.asarray(cbs)))
        grids = np.zeros((a.per_dev, cfg.n_sym_subframe * cfg.n_sc),
                         np.complex64)
        vals = []
        for s_ in crs_symbols(0, cfg):
            slot = s_ // cfg.n_sym_slot
            vals.append(seq.crs_values(cid, 2 * sf + slot,
                                       s_ % cfg.n_sym_slot, cfg.n_rb_dl))
        grids[:, crs_flat_idx(cfg, cid, 0)] = np.concatenate(vals)
        grids[:, re_idx] = syms
        x1 = np.asarray(subframe_to_samples(jnp.asarray(
            grids.reshape(a.per_dev, cfg.n_sym_subframe, cfg.n_sc)), cfg))
    x1 = x1 + (rng.standard_normal(x1.shape)
               + 1j * rng.standard_normal(x1.shape)) * np.sqrt(1e-3 / 2)

    for n_dev in [d for d in (1, 2, 4, 8) if d <= n_dev_all]:
        mesh = make_mesh(n_chan=1, n_time=n_dev,
                         devices=jax.devices()[:n_dev])
        interp = jax.default_backend() == "cpu"
        if a.xla_turbo:
            dec = make_sharded_decoder(mesh, cfg, cid, ctrl, prbs, sf, rnti,
                                       geom, scheme, n_iter=6)
        elif a.acquire:
            dec = make_sharded_acquire_decoder_pallas(
                mesh, cfg, cid, ctrl, prbs, sf, rnti, geom, scheme,
                n_iter=6, interpret=interp)
        else:
            dec = make_sharded_decoder_pallas(
                mesh, cfg, cid, ctrl, prbs, sf, rnti, geom, scheme, n_iter=6,
                interpret=interp)
        x = np.tile(x1, (n_dev, 1))
        xd = jnp.asarray(to_iq_f32(x))
        out = dec(xd)
        jax.block_until_ready(out)
        ts = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            out = dec(xd)
            np.asarray(out[2])  # transfer = reliable completion barrier
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        sps = len(x) * cfg.n_samps_subframe / t
        n_ok = int(out[2])
        results.append({"n_dev": n_dev, "samples_per_s": sps,
                        "ms": t * 1e3, "n_ok": n_ok,
                        "total_sf": len(x)})
        print(f"n_dev={n_dev}: {sps/1e6:.2f} Msps, {t*1e3:.1f} ms, "
              f"crc {n_ok}/{len(x)}", file=sys.stderr)
    base = results[0]["samples_per_s"]
    for r in results:
        r["efficiency"] = r["samples_per_s"] / (base * r["n_dev"])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
