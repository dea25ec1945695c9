import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openairinterface5g_tpu.coding.ldpc import build_graph, encode
from openairinterface5g_tpu.parallel.mesh import make_mesh, shard_batch
from openairinterface5g_tpu.parallel.sharded import (
    sharded_ldpc_decode, sharded_slot_sweep,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_ldpc_decode_matches_single():
    mesh = make_mesh()
    g = build_graph(2, 64)
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (16, g.K)).astype(np.int8)
    cw = np.asarray(encode(g, jnp.asarray(info))).astype(np.float32)
    llr = (1.0 - 2.0 * cw) * 6.0
    llr[:, : 2 * g.Z] = 0
    llr_sharded = shard_batch(mesh, jnp.asarray(llr))
    bits, ok = sharded_ldpc_decode(mesh, g, llr_sharded, n_iters=8)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(bits)[:, : g.K], info)


def test_sharded_slot_sweep_psum():
    from openairinterface5g_tpu.models.pusch import PuschConfig

    mesh = make_mesh()
    cfg = PuschConfig(mu=1, n_prb=6, mcs=4, n_layers=1, n_rx=1)
    rng = np.random.default_rng(1)
    B = 8  # one trial per device
    tb = shard_batch(mesh, jnp.asarray(rng.integers(0, 2, (B, cfg.tbs)).astype(np.int8)))
    ok, total = sharded_slot_sweep(mesh, cfg, 20.0, tb, jax.random.PRNGKey(0), n_iters=8)
    assert int(total) == B
    assert bool(np.asarray(ok).all())


def test_subcarrier_sharded_pusch_rx():
    """C7 fronthaul-split analog: subcarrier blocks sharded over 8 devices
    with pilot halo exchange + LLR all-gather + CB-sharded decode."""
    import jax
    from jax.sharding import Mesh
    from openairinterface5g_tpu.models.pusch import PuschConfig, pusch_tx
    from openairinterface5g_tpu.phy.ofdm import extract_from_grid, ofdm_demodulate
    from openairinterface5g_tpu.parallel.pusch_sp import pusch_rx_subcarrier_sharded

    mesh = Mesh(np.array(jax.devices()), axis_names=("sp",))
    cfg = PuschConfig(mu=1, n_prb=16, mcs=16, n_layers=1, n_rx=1)  # 16 PRB / 8 dev
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, (2, cfg.tbs)).astype(np.int8))
    tx, _ = pusch_tx(cfg, tb)
    noise = 0.02 * (rng.standard_normal(tx.shape) + 1j * rng.standard_normal(tx.shape))
    rx = tx + jnp.asarray(noise.astype(np.complex64))
    grid = extract_from_grid(cfg.fp, ofdm_demodulate(cfg.fp, rx, cfg.slot))
    out = pusch_rx_subcarrier_sharded(mesh, cfg, grid, n_iters=10)
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)
