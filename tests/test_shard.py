"""Sharding: mesh construction, halo-exchange correctness (shard invariance),
sharded bulk decode == unsharded decode (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lteax.shard.mesh import make_mesh, TIME_AXIS
from lteax.shard.halo import exchange_right_halo, overlap_save_correlate
from lteax.shard.pipeline import make_batch_decoder, make_sharded_decoder
from lteax.phy.config import PhyConfig
from lteax.phy.channels import pdsch as pdsch_mod
from lteax.phy.grid import pdsch_flat_idx
from lteax.apps.file_gen import GenConfig, build_subframe_grid
from lteax.phy.ofdm import subframe_to_samples
from lteax.phy import seq
from lteax.phy.grid import crs_flat_idx, crs_symbols
from lteax.phy.tables.tbs import get_tbs_for_mcs


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.shape == (1, 8)
    m2 = make_mesh(n_chan=2)
    assert m2.devices.shape == (2, 4)


def test_halo_exchange():
    mesh = make_mesh()
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)  # 8 shards of 8

    def f(xs):
        return exchange_right_halo(xs[0], 3, TIME_AXIS)[None]

    y = jax.jit(shard_map(f, mesh=mesh, in_specs=(P(TIME_AXIS, None),),
                          out_specs=P(TIME_AXIS, None)))(x)
    y = np.asarray(y)
    # shard i sees its own 8 + first 3 of shard i+1 (zeros for last)
    for i in range(8):
        np.testing.assert_array_equal(y[i, :8], np.arange(i * 8, i * 8 + 8))
        if i < 7:
            np.testing.assert_array_equal(y[i, 8:], np.arange((i + 1) * 8,
                                                              (i + 1) * 8 + 3))
        else:
            np.testing.assert_array_equal(y[i, 8:], np.zeros(3))


def test_overlap_save_shard_invariance():
    """Sharded correlation == numpy reference on the unsharded signal."""
    rng = np.random.default_rng(0)
    l, k = 512, 31
    x = (rng.standard_normal(l) + 1j * rng.standard_normal(l)).astype(np.complex64)
    taps = (rng.standard_normal(k) + 1j * rng.standard_normal(k)).astype(np.complex64)
    xpad = np.concatenate([x, np.zeros(k - 1, dtype=np.complex64)])
    ref = np.array([np.sum(xpad[n:n + k] * np.conj(taps)) for n in range(l)])

    mesh = make_mesh()
    xs = jnp.asarray(x.reshape(8, l // 8))

    def f(block):
        return overlap_save_correlate(block, jnp.asarray(taps), TIME_AXIS)

    y = jax.jit(shard_map(f, mesh=mesh, in_specs=(P(TIME_AXIS, None),),
                          out_specs=P(TIME_AXIS, None)))(xs)
    got = np.asarray(y).reshape(-1)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def _make_pdsch_samples(n_sf: int, seed: int):
    """Build n_sf subframes each carrying a full-band PDSCH TB (sf=1)."""
    rng = np.random.default_rng(seed)
    cfg = PhyConfig(n_rb_dl=6)
    cid, sf, rnti, mcs = 150, 1, 0x1234, 9
    prbs = tuple(range(6))
    cfi = 2
    ctrl = cfi + 1
    tbs, scheme = get_tbs_for_mcs(mcs, 6)
    re_idx = pdsch_flat_idx(cfg, cid, ctrl, prbs, sf)
    geom = pdsch_mod.pdsch_geometry(tbs, len(re_idx), 2, 0)
    tbs_bits = rng.integers(0, 2, size=(n_sf, tbs)).astype(np.int32)
    sams = []
    for i in range(n_sf):
        grid = np.zeros(cfg.n_sym_subframe * cfg.n_sc, dtype=np.complex64)
        vals = []
        for sym in crs_symbols(0, cfg):
            slot = sym // cfg.n_sym_slot
            vals.append(seq.crs_values(cid, 2 * sf + slot,
                                       sym % cfg.n_sym_slot, cfg.n_rb_dl))
        grid[crs_flat_idx(cfg, cid, 0)] = np.concatenate(vals)
        grid[re_idx] = np.asarray(pdsch_mod.pdsch_encode(
            tbs_bits[i], geom, rnti, sf, cid, scheme))
        sams.append(np.asarray(subframe_to_samples(
            jnp.asarray(grid.reshape(cfg.n_sym_subframe, cfg.n_sc)), cfg)))
    x = np.stack(sams)
    nv = 10 ** (-1.5)  # ~15 dB SNR
    x = x + (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape)
             ).astype(np.complex64) * np.sqrt(nv / 2)
    from lteax.io.iq import to_iq_f32
    return (cfg, cid, ctrl, prbs, sf, rnti, geom, scheme,
            to_iq_f32(x), tbs_bits)


def test_sharded_bulk_decode_matches_unsharded():
    (cfg, cid, ctrl, prbs, sf, rnti, geom, scheme, x, tb_ref) = \
        _make_pdsch_samples(8, seed=11)
    dec1 = make_batch_decoder(cfg, cid, ctrl, prbs, sf, rnti, geom, scheme,
                              n_iter=4)
    bits1, ok1 = dec1(jnp.asarray(x))
    assert bool(jnp.all(ok1))
    np.testing.assert_array_equal(np.asarray(bits1), tb_ref)

    mesh = make_mesh()
    dec8 = make_sharded_decoder(mesh, cfg, cid, ctrl, prbs, sf, rnti, geom,
                                scheme, n_iter=4)
    bits8, ok8, n_ok = dec8(jnp.asarray(x))
    assert int(n_ok) == 8
    np.testing.assert_array_equal(np.asarray(bits8), np.asarray(bits1))


def test_channel_sharded_prescan():
    """Config #5 stage 1: PSS detection over the chan mesh axis."""
    from lteax.shard.scanner import batched_prescan
    from lteax.apps.file_gen import GenConfig, generate
    rng = np.random.default_rng(4)
    cfg = PhyConfig(n_rb_dl=6)
    live1 = generate(GenConfig(n_rb_dl=6, n_cell_id=30, n_frames=1))
    live2 = generate(GenConfig(n_rb_dl=6, n_cell_id=101, n_frames=1))
    l = len(live1)
    dead = 0.01 * (rng.standard_normal((2, l))
                   + 1j * rng.standard_normal((2, l))).astype(np.complex64)
    caps = np.stack([live1, dead[0], live2, dead[1]])
    mesh = make_mesh(n_chan=4, n_time=2)
    reports = batched_prescan(caps, cfg, mesh)
    assert [r["detected"] for r in reports] == [True, False, True, False]
    assert reports[0]["n_id_2"] == 30 % 3
    assert reports[2]["n_id_2"] == 101 % 3
