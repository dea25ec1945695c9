"""Fused PUSCH frontend kernel vs the XLA reference chain.

Runs the Pallas kernel in interpreter mode on CPU and checks the
produced codeword LLRs match models.pusch.pusch_frontend numerically
(same math; only the cumsum association differs)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openairinterface5g_tpu.models import pusch
from openairinterface5g_tpu.ops import pusch_frontend_pallas as fe
from openairinterface5g_tpu.sim.channel import add_noise


def _mk_grid(cfg, seed=0, B=2):
    rng = np.random.default_rng(seed)
    tb = jnp.asarray(rng.integers(0, 2, (B, cfg.tbs)).astype(np.int8))
    grid_re, _ = pusch.pusch_tx_grid(cfg, tb)
    # simple fixed channel mixing layers -> rx + noise
    key = jax.random.PRNGKey(seed)
    h = (jax.random.normal(key, (cfg.n_rx, cfg.n_layers))
         + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                  (cfg.n_rx, cfg.n_layers))) / np.sqrt(2)
    y = jnp.einsum("rl,blsm->brsm", h.astype(jnp.complex64), grid_re)
    return add_noise(jax.random.fold_in(key, 2), y, 0.01)


CFGS = [
    dict(n_prb=24, mcs=9, n_layers=1, n_rx=1),                  # QPSK MRC
    dict(n_prb=51, mcs=16, n_layers=1, n_rx=2, chest_window=8),  # 16QAM MRC-2
    dict(n_prb=24, mcs=16, n_layers=2, n_rx=2),                  # MMSE 2x2
    dict(n_prb=24, mcs=19, n_layers=2, n_rx=2,
         dmrs_symbols=(2, 11)),                                  # 64QAM 2-DMRS
    dict(n_prb=24, mcs=9, n_layers=2, n_rx=2, dmrs_port0=2),     # delta=1 comb
    dict(n_prb=16, mcs=26, n_layers=1, n_rx=2, chest_window=0),  # 256QAM no-avg
]


@pytest.mark.parametrize("kw", CFGS)
def test_fused_frontend_matches_xla(kw):
    cfg = pusch.PuschConfig(mu=1, **kw)
    assert fe.supported(cfg)
    grid = _mk_grid(cfg)
    ref = pusch.pusch_frontend(
        dataclasses.replace(cfg, frontend_backend="xla"), grid)
    got = fe.frontend(cfg, grid, interpret=True)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 2e-4, err


def test_fused_frontend_decodes():
    cfg = pusch.PuschConfig(mu=1, n_prb=24, mcs=16, n_layers=2, n_rx=2,
                            frontend_backend="pallas")
    rng = np.random.default_rng(3)
    tb = jnp.asarray(rng.integers(0, 2, (2, cfg.tbs)).astype(np.int8))
    grid_re, _ = pusch.pusch_tx_grid(cfg, tb)
    key = jax.random.PRNGKey(9)
    h = (jax.random.normal(key, (cfg.n_rx, cfg.n_layers))
         + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                  (cfg.n_rx, cfg.n_layers))) / np.sqrt(2)
    y = jnp.einsum("rl,blsm->brsm", h.astype(jnp.complex64), grid_re)
    y = add_noise(jax.random.fold_in(key, 2), y, 1e-4)
    out = pusch.pusch_rx_grid(cfg, y, n_iters=8)
    assert bool(np.asarray(out["tb_ok"]).all())
    assert np.array_equal(np.asarray(out["tb_bits"]), np.asarray(tb))


def test_unsupported_falls_back():
    cfg = pusch.PuschConfig(mu=1, n_prb=24, mcs=9, transform_precoding=True)
    assert not fe.supported(cfg)
    grid = _mk_grid(dataclasses.replace(cfg, transform_precoding=False))
    # auto on CPU must route to the XLA path without error
    _ = pusch.pusch_frontend(cfg, grid)
