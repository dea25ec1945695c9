"""CSI-RS overlapping PDSCH (rate matching around it) + the closed
PMI loop: CSI-RS measurement -> PMI -> precoded PDSCH.

Reference anchors: gNB_scheduler_dlsch.c:62 (sched_csirs + PDSCH PDU
rate-match patterns), nr_csi_rs.c, gNB_scheduler_uci.c CSI consumption.
"""
import jax
import jax.numpy as jnp
import numpy as np

from openairinterface5g_tpu.models.csirs import (
    PMI_CODEBOOK_2TX, CsirsConfig, csi_measure_2port, csirs_rm_pattern,
    csirs_tx_grid)
from openairinterface5g_tpu.models.gnb import CsirsPdu, SlotDlConfig, gnb_dl_slot
from openairinterface5g_tpu.models.pdsch import (PdschConfig,
                                                 pdsch_tx_precoded)
from openairinterface5g_tpu.models.pusch import pusch_rx_grid
from openairinterface5g_tpu.phy.ofdm import (extract_from_grid,
                                             ofdm_demodulate)
from openairinterface5g_tpu.sim.channel import (ChannelModel, add_noise,
                                                apply_channel)


def test_pdsch_rate_matched_around_csirs():
    """PDSCH fills the BWP, CSI-RS occupies REs inside the allocation;
    the PDSCH rate-matches around them and decodes at the reference-class
    SNR with the CSI-RS actually transmitted on those REs."""
    cs = CsirsConfig(n_prb=48, symbol=6, re_offset=0, n_id=7)
    dl = PdschConfig(mu=1, n_prb=48, mcs=9, n_layers=1, n_rx=1,
                     start_symbol=2, n_symbols=12, dmrs_symbols=(2,))
    rm = csirs_rm_pattern(cs, 0, dl)
    assert len(rm) == 48 and all(s == 6 for s, _ in rm)
    dl_rm = PdschConfig(mu=1, n_prb=48, mcs=9, n_layers=1, n_rx=1,
                        start_symbol=2, n_symbols=12, dmrs_symbols=(2,),
                        rm_res=rm)
    # fewer data REs -> smaller G; TBS unchanged (scheduler overhead model)
    assert dl_rm.n_data_re == dl.n_data_re - 48
    assert dl_rm.uses_re_map

    rng = np.random.default_rng(0)
    B = 4
    tb = jnp.asarray(rng.integers(0, 2, (B, dl_rm.tbs)).astype(np.int8))
    slot = SlotDlConfig(mu=1, n_bwp_prb=48, pdsch=(dl_rm,),
                        csirs=(CsirsPdu(cs),))
    tx, _ = gnb_dl_slot(slot, [tb])
    key = jax.random.PRNGKey(1)
    sigma2 = float(jnp.mean(jnp.abs(tx) ** 2)) * (dl_rm.fp.fft_size
                                                  / dl_rm.fp.n_sc) * 10 ** (-8.0 / 10)
    rx = add_noise(key, tx, sigma2)
    grid = extract_from_grid(dl_rm.fp, ofdm_demodulate(dl_rm.fp, rx, 0))
    out = pusch_rx_grid(dl_rm, grid, n_iters=12)
    assert np.asarray(out["tb_ok"]).all(), "PDSCH must decode around CSI-RS"
    # and the UE can still measure the CSI-RS cleanly on its REs
    from openairinterface5g_tpu.models.csirs import csi_measure
    meas = csi_measure(CsirsConfig(n_prb=48, symbol=6, re_offset=0, n_id=7),
                       grid[:, :, 6, :])
    assert float(np.asarray(meas["snr_db"]).mean()) > 5.0


def test_pmi_loop_selects_better_precoder():
    """2-port CSI-RS through a random 2x1 channel; the UE-selected PMI's
    precoder must beat the worst codebook entry in post-combining power,
    and the precoded PDSCH must decode through the same channel."""
    B = 8
    cs = CsirsConfig(n_prb=48, symbol=6, re_offset=0, n_id=7, n_ports=2)
    fp_prb = 48
    model = ChannelModel("TDLA", 2, 1, 23.04e6 * 2, delay_spread_ns=100.0)
    key = jax.random.PRNGKey(3)

    # gNB: CSI-RS slot on 2 ports
    row = csirs_tx_grid(cs, B, 12 * fp_prb)           # (B, 2, n_sc)
    from openairinterface5g_tpu.config import make_frame_params
    from openairinterface5g_tpu.phy.ofdm import map_to_grid, ofdm_modulate
    fp = make_frame_params(1, fp_prb)
    grid = jnp.zeros((B, 2, fp.symbols_per_slot, fp.n_sc), jnp.complex64)
    grid = grid.at[:, :, cs.symbol].set(row)
    tx = ofdm_modulate(fp, map_to_grid(fp, grid), 0)  # (B, 2, samples)
    rx, _ = apply_channel(model, key, tx)
    rx = add_noise(jax.random.PRNGKey(4), rx, 1e-4)
    rgrid = extract_from_grid(fp, ofdm_demodulate(fp, rx, 0))
    meas = csi_measure_2port(cs, rgrid[:, :, cs.symbol, :])
    pmi = np.asarray(meas["pmi"])
    gain = np.asarray(meas["gain"])                   # (B, 4)
    # selected beats the worst entry decisively for every channel draw
    assert (gain[np.arange(B), pmi] >= gain.min(axis=1) * 1.2).all(), gain

    # precoded PDSCH through the SAME channel with the selected PMI
    dl = PdschConfig(mu=1, n_prb=fp_prb, mcs=9, n_layers=1, n_rx=1,
                     start_symbol=2, n_symbols=12, dmrs_symbols=(2,))
    rng = np.random.default_rng(5)
    tb = jnp.asarray(rng.integers(0, 2, (B, dl.tbs)).astype(np.int8))
    pmi0 = int(pmi[0])
    txp, _ = pdsch_tx_precoded(dl, tb, PMI_CODEBOOK_2TX[pmi0][:, None])
    rxp, _ = apply_channel(model, key, txp)           # same realization
    sigma2 = float(jnp.mean(jnp.abs(txp) ** 2)) * (fp.fft_size / fp.n_sc) \
        * 10 ** (-10.0 / 10)
    rxp = add_noise(jax.random.PRNGKey(6), rxp, sigma2)
    gridp = extract_from_grid(fp, ofdm_demodulate(fp, rxp, 0))
    out = pusch_rx_grid(dl, gridp, n_iters=12)
    # batch entry 0 used its own PMI; it must decode
    assert bool(np.asarray(out["tb_ok"])[0])
