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
