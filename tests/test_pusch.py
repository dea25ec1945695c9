import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openairinterface5g_tpu.models.pusch import PuschConfig, pusch_rx, pusch_tx
from openairinterface5g_tpu.sim.channel import ChannelModel, add_noise, apply_channel


def run_chain(cfg: PuschConfig, snr_db: float, batch: int = 2, seed: int = 0,
              model_name: str = "AWGN"):
    rng = np.random.default_rng(seed)
    tb = rng.integers(0, 2, size=(batch, cfg.tbs)).astype(np.int8)
    tx, _ = pusch_tx(cfg, jnp.asarray(tb))
    model = ChannelModel(model_name, cfg.n_layers, cfg.n_rx, cfg.fp.sample_rate)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    rx, _ = apply_channel(model, k1, tx)
    # SNR defined per-RE on occupied subcarriers: tx signal power is
    # n_sc/fft_size after IFFT normalization
    sig_pow = float(np.mean(np.abs(np.asarray(tx)) ** 2)) * cfg.n_rx / max(cfg.n_layers, 1)
    sigma2 = sig_pow * 10 ** (-snr_db / 10) * cfg.n_layers
    rx = add_noise(k2, rx, sigma2)
    out = pusch_rx(cfg, rx)
    return tb, out


def test_pusch_siso_qpsk_awgn():
    cfg = PuschConfig(mu=1, n_prb=24, mcs=4, n_layers=1, n_rx=1)
    tb, out = run_chain(cfg, snr_db=8.0)
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)


def test_pusch_siso_16qam_awgn():
    cfg = PuschConfig(mu=1, n_prb=24, mcs=12, n_layers=1, n_rx=1)
    tb, out = run_chain(cfg, snr_db=14.0)
    assert bool(out["tb_ok"].all())


def test_pusch_mimo2x2_awgn():
    cfg = PuschConfig(mu=1, n_prb=24, mcs=9, n_layers=2, n_rx=2)
    tb, out = run_chain(cfg, snr_db=15.0)
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)


def test_pusch_multi_cb():
    # big TB -> multiple code blocks (C > 1)
    cfg = PuschConfig(mu=1, n_prb=106, mcs=16, n_layers=1, n_rx=1)
    p, _ = cfg.seg_params()
    assert p.C > 1
    tb, out = run_chain(cfg, snr_db=18.0)
    assert bool(out["tb_ok"].all())


def test_pusch_fails_at_low_snr():
    cfg = PuschConfig(mu=1, n_prb=24, mcs=20, n_layers=1, n_rx=1)
    _, out = run_chain(cfg, snr_db=-10.0)
    assert not bool(out["tb_ok"].any())


def test_pusch_transform_precoding():
    cfg = PuschConfig(mu=1, n_prb=24, mcs=9, n_layers=1, n_rx=1,
                      transform_precoding=True)
    tb, out = run_chain(cfg, snr_db=10.0)
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)


def test_pusch_mimo4x4():
    cfg = PuschConfig(mu=1, n_prb=24, mcs=9, n_layers=4, n_rx=4)
    rng = np.random.default_rng(44)
    tb = jnp.asarray(rng.integers(0, 2, (2, cfg.tbs)).astype(np.int8))
    tx, _ = pusch_tx(cfg, tb)
    H = (rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))).astype(np.complex64) / np.sqrt(2)
    H = H + 2 * np.eye(4, dtype=np.complex64)  # well-conditioned
    rx = jnp.einsum("rt,bts->brs", jnp.asarray(H), tx)
    noise = 0.02 * (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape))
    out = pusch_rx(cfg, rx + jnp.asarray(noise.astype(np.complex64)), n_iters=10)
    assert bool(out["tb_ok"].all())


def test_pusch_int8_llr_parity():
    """8-bit quantized LLRs (reference int8 pipeline parity) must decode at
    the same operating point as float."""
    cfg_f = PuschConfig(mu=1, n_prb=24, mcs=9)
    cfg_q = PuschConfig(mu=1, n_prb=24, mcs=9, llr_quant_bits=8)
    tb, out_f = run_chain(cfg_f, snr_db=6.5, batch=4, seed=3)
    tb2, out_q = run_chain(cfg_q, snr_db=6.5, batch=4, seed=3)
    assert bool(out_f["tb_ok"].all()) and bool(out_q["tb_ok"].all())


def test_uci_on_pusch():
    """HARQ-ACK multiplexed on PUSCH: both TB and ACK decode (puncturing)."""
    from openairinterface5g_tpu.models.uci_on_pusch import UciOnPuschConfig
    from openairinterface5g_tpu.sim.channel import add_noise
    import jax as _jax

    cfg = PuschConfig(mu=1, n_prb=24, mcs=9)
    ucfg = UciOnPuschConfig(n_ack_bits=2)
    rng = np.random.default_rng(8)
    B = 4
    tb = jnp.asarray(rng.integers(0, 2, (B, cfg.tbs)).astype(np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (B, 2)).astype(np.int8))
    tx, _ = pusch_tx(cfg, tb, uci_cfg=ucfg, ack_bits=ack)
    sig = float(np.mean(np.abs(np.asarray(tx)) ** 2))
    rx = add_noise(_jax.random.PRNGKey(0), tx, sig * 10 ** (-8.0 / 10) * (cfg.fp.fft_size / cfg.fp.n_sc))
    out = pusch_rx(cfg, rx, n_iters=15, uci_cfg=ucfg)
    assert bool(out["tb_ok"].all()), "TB must survive the UCI puncturing"
    np.testing.assert_array_equal(np.asarray(out["ack_bits"]), np.asarray(ack))
