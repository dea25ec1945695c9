"""LTE PHY chain tests: PDSCH/PUSCH/PBCH end-to-end, rate matching,
segmentation (reference: openair1/SIMULATION/LTE_PHY sims + 36.212)."""
import numpy as np
import jax.numpy as jnp
import pytest


def test_lte_segmentation_params():
    from openairinterface5g_tpu.lte.segmentation import segment_params
    # single block, no CRC24B
    p = segment_params(1000)
    assert p.C == 1 and p.k_plus >= 1000 and p.F == p.k_plus - 1000
    # the 20 MHz MCS28 peak TBS: 13 blocks, mixed K allowed by spec
    p = segment_params(75400)
    assert p.C == 13
    assert sum(p.block_sizes) - p.C * 24 - p.F == 75400


def test_lte_turbo_rm_roundtrip():
    from openairinterface5g_tpu.lte import rate_matching as rm
    K, E, rv = 512, 900, 0
    idx = rm.turbo_rm_indices(K, E, rv)
    assert idx.shape == (E,) and idx.min() >= 0 and idx.max() < 3 * (K + 4)
    # systematic-first property at rv0: early selections favor stream d0
    assert (idx[:100] < K + 4).mean() > 0.9
    # soft-combine then re-select is identity on hard decisions at high SNR
    rng = np.random.default_rng(0)
    d = rng.integers(0, 2, (2, 3 * (K + 4))).astype(np.int8)
    e = np.asarray(rm.rate_match_tx(jnp.asarray(d), idx))
    llr = 1.0 - 2.0 * e.astype(np.float32)
    soft = np.asarray(rm.rate_match_rx(jnp.asarray(llr), idx, 3 * (K + 4)))
    sel = soft[:, idx]
    assert np.all((sel < 0) == (e == 1))


def test_lte_conv_rm_covers_all_bits():
    from openairinterface5g_tpu.lte import rate_matching as rm
    idx = rm.conv_rm_indices(40, 1920)
    assert sorted(set(idx.tolist())) == list(range(120))


def test_lte_pdsch_e2e_awgn():
    from openairinterface5g_tpu.lte.pdsch import LtePdschConfig, pdsch_tx, pdsch_rx
    cfg = LtePdschConfig(n_rb=25, n_prb=25, mcs=10, n_rx=1)
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, (2, cfg.tbs)).astype(np.int8))
    tx, _ = pdsch_tx(cfg, tb)
    noise = 0.02 * (rng.normal(size=tx.shape) + 1j * rng.normal(size=tx.shape))
    out = pdsch_rx(cfg, tx + noise.astype(np.complex64))
    assert bool(jnp.all(out["tb_ok"]))
    assert bool(jnp.all(out["tb_bits"] == tb))


def test_lte_pdsch_multi_cb_filler():
    """Multi-CB segmentation with CRC24B + filler bits decodes."""
    from openairinterface5g_tpu.lte.pdsch import LtePdschConfig, pdsch_tx, pdsch_rx
    cfg = LtePdschConfig(n_rb=50, n_prb=50, mcs=17, n_rx=1,
                         tbs_override=14000)
    p = cfg.seg()
    assert p.C > 1
    rng = np.random.default_rng(1)
    tb = jnp.asarray(rng.integers(0, 2, (1, cfg.tbs)).astype(np.int8))
    tx, _ = pdsch_tx(cfg, tb)
    noise = 0.02 * (rng.normal(size=tx.shape) + 1j * rng.normal(size=tx.shape))
    out = pdsch_rx(cfg, tx + noise.astype(np.complex64))
    assert bool(jnp.all(out["tb_ok"]))
    assert out["cb_ok"].shape == (1, p.C)


def test_lte_pdsch_harq_rv():
    """rv 2 retransmission decodes standalone at moderate rate."""
    from openairinterface5g_tpu.lte.pdsch import LtePdschConfig, pdsch_tx, pdsch_rx
    cfg = LtePdschConfig(n_rb=25, n_prb=25, mcs=6, n_rx=1)
    rng = np.random.default_rng(2)
    tb = jnp.asarray(rng.integers(0, 2, (1, cfg.tbs)).astype(np.int8))
    tx, _ = pdsch_tx(cfg, tb, rv=2)
    noise = 0.02 * (rng.normal(size=tx.shape) + 1j * rng.normal(size=tx.shape))
    out = pdsch_rx(cfg, tx + noise.astype(np.complex64), rv=2)
    assert bool(jnp.all(out["tb_ok"]))


def test_lte_pusch_e2e_fading():
    from openairinterface5g_tpu.lte.pusch import LtePuschConfig, pusch_tx, pusch_rx
    cfg = LtePuschConfig(n_rb=25, n_prb=25, mcs=16, n_rx=2)
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, (2, cfg.tbs)).astype(np.int8))
    tx, _ = pusch_tx(cfg, tb)
    h = jnp.asarray((rng.normal(size=(2, 2, 1))
                     + 1j * rng.normal(size=(2, 2, 1))).astype(np.complex64)) / np.sqrt(2)
    rx = h * tx + 0.05 * jnp.asarray(
        (rng.normal(size=(2, 2, tx.shape[-1]))
         + 1j * rng.normal(size=(2, 2, tx.shape[-1]))).astype(np.complex64))
    out = pusch_rx(cfg, rx)
    assert bool(jnp.all(out["tb_ok"]))
    assert bool(jnp.all(out["tb_bits"] == tb))


def test_lte_pbch_antenna_mask():
    from openairinterface5g_tpu.lte.pbch import (LtePbchConfig, pbch_tx_grids,
                                                 pbch_rx_grids)
    cfg = LtePbchConfig(n_rb=25, cell_id=17, n_tx_ports=2, n_rx=2)
    rng = np.random.default_rng(1)
    mib = jnp.asarray(rng.integers(0, 2, (3, 24)).astype(np.int8))
    grids = pbch_tx_grids(cfg, mib)
    n_sc = cfg.fp.n_sc
    h = jnp.asarray((rng.normal(size=(3, 2, n_sc))
                     + 1j * rng.normal(size=(3, 2, n_sc))).astype(np.complex64))
    rx = h[:, None, :, None, :] * grids[:, :, None] + 0.1 * jnp.asarray(
        (rng.normal(size=(3, 4, 2, 14, n_sc))
         + 1j * rng.normal(size=(3, 4, 2, 14, n_sc))).astype(np.complex64))
    mib_d, ok, ports = pbch_rx_grids(cfg, rx, h)
    assert bool(jnp.all(ok))
    assert bool(jnp.all(ports == 2))
    assert bool(jnp.all(mib_d == mib))


def test_lte_crs_sequence_properties():
    from openairinterface5g_tpu.lte import refsig
    s = refsig.crs_sequence_np(2, 0, 17, 50)
    assert s.shape == (100,)
    assert np.allclose(np.abs(s), 1.0, atol=1e-6)
    # different symbols/slots give different sequences
    assert not np.allclose(s, refsig.crs_sequence_np(2, 4, 17, 50))
    assert not np.allclose(s, refsig.crs_sequence_np(3, 0, 17, 50))


def test_lte_pss_sss():
    from openairinterface5g_tpu.lte import refsig
    p0 = refsig.pss_sequence_np(0)
    assert p0.shape == (62,) and np.allclose(np.abs(p0), 1.0, atol=1e-6)
    # SSS distinguishes cell groups and subframe 0 vs 5
    s_a = refsig.sss_sequence_np(0, 0, 0)
    s_b = refsig.sss_sequence_np(1, 0, 0)
    s_c = refsig.sss_sequence_np(0, 0, 5)
    assert not np.allclose(s_a, s_b)
    assert not np.allclose(s_a, s_c)
    assert np.all(np.abs(s_a) == 1)
