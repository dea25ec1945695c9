"""MU-MIMO: two UEs co-scheduled on the same PRBs with orthogonal
codebook precoders selected from their CSI reports, each decoding its
own TB through MMSE interference suppression."""
import jax
import jax.numpy as jnp
import numpy as np

from openairinterface5g_tpu.models import mu_mimo
from openairinterface5g_tpu.models.csirs import (CsirsConfig,
                                                 csi_measure_2port,
                                                 csirs_tx_grid)
from openairinterface5g_tpu.phy.ofdm import (extract_from_grid,
                                             map_to_grid, ofdm_demodulate,
                                             ofdm_modulate)
from openairinterface5g_tpu.sim.channel import (ChannelModel, add_noise,
                                                apply_channel)
from openairinterface5g_tpu.config import make_frame_params


def test_mu_pair_select_orthogonality():
    from openairinterface5g_tpu.models.csirs import PMI_CODEBOOK_2TX
    g1 = np.array([9.0, 1.0, 2.0, 1.0])
    g2 = np.array([1.0, 8.0, 1.0, 2.0])
    i, j = mu_mimo.mu_pair_select(g1, g2)
    assert abs(np.vdot(PMI_CODEBOOK_2TX[i], PMI_CODEBOOK_2TX[j])) < 1e-6
    assert (i, j) == (0, 1)      # both UEs get their best orthogonal pair


def test_mu_mimo_two_ues_same_prbs():
    """Both UEs' TBs decode on SHARED PRBs; CSI-driven pairing."""
    n_prb = 24
    fp = make_frame_params(1, n_prb)
    rng = np.random.default_rng(0)
    B = 4
    # distinct 2x2 channels per UE (same realization for CSI + data)
    ch1 = ChannelModel("TDLA", 2, 2, fp.sample_rate, delay_spread_ns=80.0)
    ch2 = ChannelModel("TDLB", 2, 2, fp.sample_rate, delay_spread_ns=120.0)
    k1, k2 = jax.random.PRNGKey(10), jax.random.PRNGKey(20)

    # CSI phase: 2-port CSI-RS through each UE's channel
    cs = CsirsConfig(n_prb=n_prb, symbol=6, n_ports=2, n_id=3)
    row = csirs_tx_grid(cs, B, fp.n_sc)
    grid = jnp.zeros((B, 2, fp.symbols_per_slot, fp.n_sc), jnp.complex64)
    grid = grid.at[:, :, cs.symbol].set(row)
    tx_cs = ofdm_modulate(fp, map_to_grid(fp, grid), 0)
    gains = []
    for ch, k in ((ch1, k1), (ch2, k2)):
        rx, _ = apply_channel(ch, k, tx_cs)
        rx = add_noise(jax.random.fold_in(k, 1), rx, 1e-4)
        rg = extract_from_grid(fp, ofdm_demodulate(fp, rx, 0))
        gains.append(np.asarray(csi_measure_2port(
            cs, rg[:, :, cs.symbol, :])["gain"])[0])
    pmi1, pmi2 = mu_mimo.mu_pair_select(gains[0], gains[1])

    # data phase: superposed precoded streams through each UE's channel
    cfg1, cfg2 = mu_mimo.mu_cfgs(n_prb, rnti1=0x1001, rnti2=0x1002)
    tb1 = jnp.asarray(rng.integers(0, 2, (B, cfg1.tbs)).astype(np.int8))
    tb2 = jnp.asarray(rng.integers(0, 2, (B, cfg2.tbs)).astype(np.int8))
    tx = mu_mimo.mu_mimo_tx(cfg1, cfg2, tb1, tb2, pmi1, pmi2)
    sigma2 = float(jnp.mean(jnp.abs(tx) ** 2)) * (fp.fft_size / fp.n_sc) \
        * 10 ** (-16.0 / 10)
    outs = []
    for (cfg, port, ch, k) in ((cfg1, 0, ch1, k1), (cfg2, 1, ch2, k2)):
        rx, _ = apply_channel(ch, k, tx)       # same realization as CSI
        rx = add_noise(jax.random.fold_in(k, 2), rx, sigma2)
        outs.append(mu_mimo.mu_mimo_rx(cfg, port, rx, n_iters=12))
    ok1 = np.asarray(outs[0]["tb_ok"])
    ok2 = np.asarray(outs[1]["tb_ok"])
    assert ok1.all() and ok2.all(), (ok1, ok2)
    assert (np.asarray(outs[0]["tb_bits"]) == np.asarray(tb1)).all()
    assert (np.asarray(outs[1]["tb_bits"]) == np.asarray(tb2)).all()
