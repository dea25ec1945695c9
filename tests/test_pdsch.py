import numpy as np
import jax
import jax.numpy as jnp

from openairinterface5g_tpu.models.pdsch import (
    Pdsch2CwConfig, PdschConfig, pdsch2cw_rx, pdsch2cw_tx, pdsch_rx, pdsch_tx,
)
from openairinterface5g_tpu.sim.channel import add_noise


def _awgn(tx, snr_db, fp, key=0):
    sig = float(np.mean(np.abs(np.asarray(tx)) ** 2))
    return add_noise(jax.random.PRNGKey(key), tx,
                     sig * 10 ** (-snr_db / 10) * (fp.fft_size / fp.n_sc))


def test_pdsch_double_symbol_dmrs_2x2():
    """maxLength=2 DMRS (symbol pair 2,3) with 2 layers decodes; the time
    OCC must not disturb the single-pair estimate."""
    cfg = PdschConfig(mu=1, n_prb=24, mcs=9, n_layers=2, n_rx=2,
                      dmrs_symbols=(2, 3), dmrs_max_len=2)
    rng = np.random.default_rng(21)
    tb = jnp.asarray(rng.integers(0, 2, (4, cfg.tbs)).astype(np.int8))
    tx, _ = pdsch_tx(cfg, tb)
    rx = _awgn(tx, 14.0, cfg.fp)
    out = pdsch_rx(cfg, rx, n_iters=15)
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), np.asarray(tb))


def test_pdsch_2codeword_6layer():
    """2-codeword PDSCH, 6 layers (3+3), 8 RX, double-symbol DMRS ports
    0..5, per-cw scrambling q=0/1: both TBs decode over AWGN with a mild
    mixing channel."""
    cfg = Pdsch2CwConfig(mu=1, n_prb=12, mcs0=4, mcs1=4, n_layers=6, n_rx=8)
    c0, c1 = cfg.cw_cfgs()
    rng = np.random.default_rng(22)
    B = 2
    tb0 = jnp.asarray(rng.integers(0, 2, (B, c0.tbs)).astype(np.int8))
    tb1 = jnp.asarray(rng.integers(0, 2, (B, c1.tbs)).astype(np.int8))
    tx = pdsch2cw_tx(cfg, tb0, tb1)                 # (B, 6, samples)
    # mild static mixing 8x6 channel (identity-ish) + AWGN
    H = (np.eye(8, 6) + 0.1 * (rng.standard_normal((8, 6))
                               + 1j * rng.standard_normal((8, 6)))).astype(np.complex64)
    rx = jnp.einsum("rl,bls->brs", jnp.asarray(H), tx)
    rx = _awgn(rx, 20.0, c0.fp, key=1)
    out0, out1 = pdsch2cw_rx(cfg, rx, n_iters=15)
    assert bool(out0["tb_ok"].all()), "codeword 0 failed"
    assert bool(out1["tb_ok"].all()), "codeword 1 failed"
    np.testing.assert_array_equal(np.asarray(out0["tb_bits"]), np.asarray(tb0))
    np.testing.assert_array_equal(np.asarray(out1["tb_bits"]), np.asarray(tb1))
