"""Generate golden fixtures: every intermediate tensor of the DL chain for a
fixed configuration (SURVEY.md §4).  Run from the repo root:

    python tests/golden/generate.py

Overwrites tests/golden/dl_chain.npz.  Commit the result; test_golden.py
asserts the current code reproduces it bit-for-bit (float: exactly — same
ops, same platform class), catching accidental bit-level changes to any
stage of the pipeline.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def build():
    from lteax.phy.config import PhyConfig
    from lteax.phy import seq
    from lteax.phy.fec.crc import attach_crc_np
    from lteax.phy.fec.conv import conv_encode
    from lteax.phy.fec.turbo import turbo_encode
    from lteax.phy.fec.ratematch import turbo_rm_indices, conv_rm_indices, rate_match
    from lteax.phy.mod import modulate
    from lteax.phy.ofdm import subframe_to_samples
    from lteax.phy.channels import pbch, pcfich, pdsch as pdsch_mod
    from lteax.phy.channels.dci import Dci1A, dci_1a_pack
    from lteax.phy.channels.pdcch import pdcch_encode
    from lteax.apps.file_gen import GenConfig, generate

    rng = np.random.default_rng(12345)
    out = {}
    cfg = PhyConfig(n_rb_dl=6)
    cid = 214

    # FEC stage vectors
    msg = rng.integers(0, 2, size=40).astype(np.int64)
    out["crc_in"] = msg
    out["crc24a"] = attach_crc_np(msg, "24A")
    out["crc16_masked"] = attach_crc_np(msg[:24], "16",
                                        np.ones(16, dtype=np.int64))
    out["conv_d"] = np.asarray(conv_encode(jnp.asarray(msg)))
    out["conv_rm96"] = np.asarray(rate_match(
        jnp.asarray(out["conv_d"]), conv_rm_indices(40, 96)))
    tb = rng.integers(0, 2, size=104).astype(np.int32)
    out["turbo_in"] = tb
    out["turbo_d"] = np.asarray(turbo_encode(jnp.asarray(tb), 104))
    for rv in (0, 2):
        out[f"turbo_rm_rv{rv}"] = np.asarray(rate_match(
            jnp.asarray(out["turbo_d"]), turbo_rm_indices(108, 160, rv)))

    # sequences
    out["gold_c"] = seq.gold_sequence_np(0x12345, 256)
    out["pss_f"] = seq.pss_sequence(1)
    out["sss_sf0"] = seq.sss_sequence(71, 1, False)
    out["sss_sf5"] = seq.sss_sequence(71, 1, True)
    out["crs"] = seq.crs_values(cid, 3, 0, 6)

    # modulation
    bits = rng.integers(0, 2, size=120).astype(np.int32)
    out["mod_bits"] = bits
    for scheme in ("qpsk", "16qam", "64qam"):
        out[f"mod_{scheme}"] = np.asarray(modulate(jnp.asarray(bits), scheme))

    # channel codecs
    mib = rng.integers(0, 2, size=24).astype(np.int32)
    out["mib_bits"] = mib
    out["pbch_quarters"] = np.asarray(pbch.pbch_encode_40ms(
        jnp.asarray(mib), 2, cid))
    out["pcfich_sf3_cfi2"] = np.asarray(pcfich.pcfich_encode(2, cid, 3))
    dci = dci_1a_pack(Dci1A(rb_start=0, l_crb=6, mcs=4, rv=0), 6)
    out["dci_1a_bits"] = dci
    out["pdcch_syms"] = np.asarray(pdcch_encode(
        [(dci, 0xFFFF, 0, 4)], cfg, cid, 3, 1.0, 5))
    geom = pdsch_mod.pdsch_geometry(328, 500, 2, 0)
    tb2 = rng.integers(0, 2, size=328).astype(np.int32)
    out["pdsch_tb"] = tb2
    out["pdsch_syms"] = np.asarray(pdsch_mod.pdsch_encode(
        tb2, geom, 0xFFFF, 5, cid, "qpsk"))

    # OFDM + full frame
    grid = (rng.standard_normal((cfg.n_sym_subframe, cfg.n_sc))
            + 1j * rng.standard_normal((cfg.n_sym_subframe, cfg.n_sc))
            ).astype(np.complex64)
    out["ofdm_grid"] = grid
    out["ofdm_samps"] = np.asarray(subframe_to_samples(jnp.asarray(grid), cfg))
    out["frame"] = generate(GenConfig(n_rb_dl=6, n_cell_id=cid, n_frames=1))
    return out


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "dl_chain.npz")
    np.savez_compressed(path, **build())
    print(f"wrote {path}")
