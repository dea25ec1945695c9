"""RU <-> L1 IF4p5-analog fronthaul split: BLER parity through the
int16 freq-domain quantization, RU and L1 as concurrent endpoints.

The C7 functional split as an actual transport boundary: per-(symbol,
antenna) UDP packets of block-floating-point int16 IQ, UL and DL."""
import threading

import numpy as np

from openairinterface5g_tpu.fronthaul import if4p5
from openairinterface5g_tpu.runtime import ru_l1_split


def test_if4p5_codec_roundtrip():
    rng = np.random.default_rng(0)
    iq = (rng.normal(size=600) + 1j * rng.normal(size=600)
          ).astype(np.complex64) * 3.7
    p = if4p5.If4p5Packet(if4p5.UL_FD, 12, 3, 5, 1, 42, iq)
    q = if4p5.unpack(if4p5.pack(p))
    assert (q.frame, q.slot, q.symbol, q.antenna) == (12, 3, 5, 1)
    # int16 BFP: relative error bounded by the quantization step
    err = np.abs(q.iq - iq).max() / np.abs(iq).max()
    assert err < 1e-3, err


def test_ru_l1_split_bler():
    res = {}

    def ru():
        ru_l1_split.run_ru(n_trials=32, log=lambda *a: None)

    t = threading.Thread(target=ru)
    t.start()
    res["l1"] = ru_l1_split.run_l1(n_trials=32, log=lambda *a: None)
    t.join(timeout=600)
    assert res["l1"] is True, "BLER parity through the IF4p5 split failed"


def test_if5_time_domain_roundtrip():
    """IF5-analog lower split: a full slot waveform chunked into int16
    BFP datagrams reassembles bit-faithfully enough to decode a PUSCH
    slot end to end (the time-domain RU<->L1 boundary)."""
    import jax
    import jax.numpy as jnp
    from openairinterface5g_tpu.fronthaul import if5
    from openairinterface5g_tpu.models.pusch import (PuschConfig, pusch_rx,
                                                     pusch_tx)

    cfg = PuschConfig(mu=1, n_prb=24, mcs=9, n_layers=1, n_rx=1)
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, (1, cfg.tbs)).astype(np.int8))
    tx, _ = pusch_tx(cfg, tb)
    rx = np.asarray(tx + 0.02 * jax.random.normal(
        jax.random.PRNGKey(1), tx.shape).astype(np.complex64))[0]
    pkts = if5.slot_to_packets(if5.UL_TD, 7, 3, rx)
    rng.shuffle(pkts)                       # UDP reordering
    typ, frame, slot, wav = if5.packets_to_slot(pkts, 1, rx.shape[-1])
    assert (typ, frame, slot) == (if5.UL_TD, 7, 3)
    err = np.abs(wav - rx).max() / np.abs(rx).max()
    assert err < 2e-3, err
    out = pusch_rx(cfg, jnp.asarray(wav[None]), n_iters=8)
    assert bool(np.asarray(out["tb_ok"])[0])


def test_oran_ecpri_uplane_roundtrip():
    """O-RAN 7.2 framing analog: eCPRI U-plane packets with 9-bit BFP
    PRB compression carry a full PUSCH slot grid through the split and
    it still decodes (the fhi_72 packet-grammar role)."""
    import jax.numpy as jnp
    from openairinterface5g_tpu.fronthaul import oran
    from openairinterface5g_tpu.models.pusch import (PuschConfig,
                                                     pusch_rx_grid, pusch_tx)
    from openairinterface5g_tpu.phy.ofdm import (extract_from_grid,
                                                 ofdm_demodulate)

    rng = np.random.default_rng(0)
    # header codec exactness
    iq = (rng.normal(size=(4, 12)) + 1j * rng.normal(size=(4, 12))
          ).astype(np.complex64) * 2.3
    m = oran.OranUPlane(pcid=3, seqid=77, frame=21, subframe=4, slot=13,
                        start_sym=9, iq=iq)
    q = oran.unpack_uplane(oran.pack_uplane(m))
    assert (q.pcid, q.seqid, q.frame, q.subframe, q.slot, q.start_sym) \
        == (3, 77, 21, 4, 13, 9)
    err = np.abs(q.iq - iq).max() / np.abs(iq).max()
    assert err < 5e-3, err       # 9-bit BFP mantissa

    # slot grid through per-symbol eCPRI packets -> decode
    import jax
    cfg = PuschConfig(mu=1, n_prb=24, mcs=9, n_layers=1, n_rx=1)
    tb = jnp.asarray(rng.integers(0, 2, (1, cfg.tbs)).astype(np.int8))
    tx, _ = pusch_tx(cfg, tb)
    rx = tx + 0.02 * jax.random.normal(jax.random.PRNGKey(1), tx.shape
                                       ).astype(np.complex64)
    grid = np.asarray(extract_from_grid(cfg.fp, ofdm_demodulate(
        cfg.fp, rx, 0)))[0, 0]                     # (14, n_sc)
    rebuilt = np.zeros_like(grid)
    seq = 0
    for s in range(14):
        for pkt in oran.symbol_to_uplane(0, seq, 0, 0, 0, s, grid[s]):
            u = oran.unpack_uplane(pkt)
            assert u.start_sym == s
            rebuilt[s, : u.iq.size] = u.iq.reshape(-1)
            seq += 1
    out = pusch_rx_grid(cfg, jnp.asarray(rebuilt[None, None]), n_iters=8)
    assert bool(np.asarray(out["tb_ok"])[0])
