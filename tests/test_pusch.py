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
    # DFT-s-OFDM DMRS is the low-PAPR sequence (constant modulus), not
    # Gold QPSK (TS 38.211 6.4.1.1.1.2)
    pil = np.asarray(cfg.dmrs_pilot(cfg.dmrs_symbols[0]))
    assert np.allclose(np.abs(pil), 1.0, atol=1e-5)
    gold = np.asarray(PuschConfig(mu=1, n_prb=24, mcs=9).dmrs_pilot(2))
    assert not np.allclose(pil, gold)


def test_pusch_transform_precoding_seq_hopping():
    """Sequence hopping (v) active for a 24-PRB DFT-s allocation: slots
    pick different v and the chain still decodes."""
    from openairinterface5g_tpu.phy.hopping import group_sequence_uv
    vs = {group_sequence_uv(7, "disable", s, 0, m_zc=6 * 24)[1]
          for s in range(16)}
    assert vs == {0, 1}
    cfg = PuschConfig(mu=1, n_prb=24, mcs=9, n_layers=1, n_rx=1,
                      transform_precoding=True, group_seq_hopping="disable",
                      slot=3, n_id=7)
    tb, out = run_chain(cfg, snr_db=10.0)
    assert bool(out["tb_ok"].all())


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


def test_uci_csi_rate_matched_on_pusch():
    """ACK(>2 -> rate-matched) + CSI part 1 + part 2 all decode, TB intact."""
    from openairinterface5g_tpu.models.uci_on_pusch import UciOnPuschConfig
    from openairinterface5g_tpu.sim.channel import add_noise
    import jax as _jax

    cfg = PuschConfig(mu=1, n_prb=24, mcs=9)
    ucfg = UciOnPuschConfig(n_ack_bits=4, n_csi1_bits=6, n_csi2_bits=13)
    g_ack, g_c1, g_c2, g_data = ucfg.g_sizes(cfg)
    assert g_data == cfg.G - g_ack - g_c1 - g_c2
    rng = np.random.default_rng(9)
    B = 4
    tb = jnp.asarray(rng.integers(0, 2, (B, cfg.tbs)).astype(np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (B, 4)).astype(np.int8))
    c1 = jnp.asarray(rng.integers(0, 2, (B, 6)).astype(np.int8))
    c2 = jnp.asarray(rng.integers(0, 2, (B, 13)).astype(np.int8))
    tx, _ = pusch_tx(cfg, tb, uci_cfg=ucfg, ack_bits=ack, csi1_bits=c1,
                     csi2_bits=c2)
    sig = float(np.mean(np.abs(np.asarray(tx)) ** 2))
    rx = add_noise(_jax.random.PRNGKey(1), tx,
                   sig * 10 ** (-8.0 / 10) * (cfg.fp.fft_size / cfg.fp.n_sc))
    out = pusch_rx(cfg, rx, n_iters=15, uci_cfg=ucfg)
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["uci"]["ack"]), np.asarray(ack))
    np.testing.assert_array_equal(np.asarray(out["uci"]["csi1"]), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(out["uci"]["csi2"]), np.asarray(c2))
    assert bool(np.asarray(out["uci"]["csi2_ok"]).all())


def test_uci_ack_punctures_csi2():
    """<=2 ACK bits (puncture mode) + large CSI part 2: the ACK candidate
    REs may collide with CSI2 REs; per 38.212 6.2.7 the ACK punctures CSI
    part 2 there and everything still decodes (advisor round-1 repro:
    n_prb=8, n_ack=2, n_csi1=6, n_csi2=32 used to crash _build_map)."""
    from openairinterface5g_tpu.models.uci_on_pusch import (
        UciOnPuschConfig, _build_map)
    from openairinterface5g_tpu.sim.channel import add_noise
    import jax as _jax

    cfg = PuschConfig(mu=1, n_prb=8, mcs=9)
    ucfg = UciOnPuschConfig(n_ack_bits=2, n_csi1_bits=6, n_csi2_bits=32)
    maps = _build_map(cfg, ucfg)   # must not raise
    ack_res, _, c2_res = maps[0], maps[1], maps[2]
    rng = np.random.default_rng(13)
    B = 4
    tb = jnp.asarray(rng.integers(0, 2, (B, cfg.tbs)).astype(np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (B, 2)).astype(np.int8))
    c1 = jnp.asarray(rng.integers(0, 2, (B, 6)).astype(np.int8))
    c2 = jnp.asarray(rng.integers(0, 2, (B, 32)).astype(np.int8))
    tx, _ = pusch_tx(cfg, tb, uci_cfg=ucfg, ack_bits=ack, csi1_bits=c1,
                     csi2_bits=c2)
    sig = float(np.mean(np.abs(np.asarray(tx)) ** 2))
    rx = add_noise(_jax.random.PRNGKey(3),
                   tx, sig * 10 ** (-10.0 / 10) * (cfg.fp.fft_size / cfg.fp.n_sc))
    out = pusch_rx(cfg, rx, n_iters=15, uci_cfg=ucfg)
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["ack_bits"]), np.asarray(ack))
    np.testing.assert_array_equal(np.asarray(out["uci"]["csi1"]), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(out["uci"]["csi2"]), np.asarray(c2))


def test_small_block_conf_flags_dtx():
    """uci_decode's ok flag for <=11-bit payloads is correlation-based:
    true on a clean codeword, false on pure noise (DTX)."""
    from openairinterface5g_tpu.models.pucch import uci_encode, uci_decode

    rng = np.random.default_rng(5)
    bits = jnp.asarray(rng.integers(0, 2, (4, 4)).astype(np.int8))
    cw = uci_encode(4, 64, bits)
    llr = 8.0 * (1.0 - 2.0 * cw.astype(jnp.float32))
    dec, ok = uci_decode(4, 64, llr)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))
    assert bool(np.asarray(ok).all())
    noise = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    _, ok_dtx = uci_decode(4, 64, noise)
    assert not bool(np.asarray(ok_dtx).any())


def test_ptrs_phase_tracking_recovers_cpe():
    """PUSCH with PTRS survives per-symbol common phase error that breaks
    the no-PTRS receiver (phase noise scenario, 38.211 §6.4.1.2)."""
    import jax as _jax
    from openairinterface5g_tpu.sim.channel import add_noise

    rng = np.random.default_rng(11)
    B = 4
    phases = 0.35 * (np.arange(14) - 2.0)  # CFO-like ramp, 0 at DMRS symbol
    rot = np.exp(1j * phases).astype(np.complex64)

    def run(ptrs: bool):
        cfg = PuschConfig(mu=1, n_prb=24, mcs=9, ptrs=ptrs, ptrs_k=2, ptrs_l=1)
        tb = jnp.asarray(rng.integers(0, 2, (B, cfg.tbs)).astype(np.int8))
        tx, _ = pusch_tx(cfg, tb)
        fp = cfg.fp
        # apply per-symbol CPE in the frequency domain via grid round trip
        from openairinterface5g_tpu.phy.ofdm import (extract_from_grid,
                                                     map_to_grid,
                                                     ofdm_demodulate,
                                                     ofdm_modulate)
        grid = ofdm_demodulate(fp, tx, cfg.slot)
        grid = grid * jnp.asarray(rot)[None, None, :, None]
        rx = ofdm_modulate(fp, grid, cfg.slot)
        sig = float(np.mean(np.abs(np.asarray(rx)) ** 2))
        rx = add_noise(_jax.random.PRNGKey(2), rx,
                       sig * 10 ** (-9.0 / 10) * (fp.fft_size / fp.n_sc))
        out = pusch_rx(cfg, rx, n_iters=12)
        return bool(np.asarray(out["tb_ok"]).all())

    assert run(True), "PTRS receiver must correct the CPE"
    assert not run(False), "sanity: without PTRS this CPE breaks decoding"


def test_pusch_lbrm_roundtrip():
    """LBRM (tbs_lbrm) limits the circular buffer: Ncb < 66Z, decode still
    clean at good SNR, and selection indices stay below Ncb (38.212
    5.4.2.1)."""
    from openairinterface5g_tpu.coding.rate_matching import selection_indices
    cfg = PuschConfig(mu=1, n_prb=24, mcs=9, tbs_lbrm=5000)
    p, _ = cfg.seg_params()
    ncb = cfg.ncb()
    assert ncb is not None and ncb < 66 * p.Z
    sel = selection_indices(p.bg, p.Z, p.K // p.Z, 0, cfg.cb_e_sizes()[0],
                            p.F, ncb)
    assert sel.max() < ncb
    tb, out = run_chain(cfg, snr_db=12.0)
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)
