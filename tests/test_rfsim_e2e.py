"""Two-endpoint DL end-to-end over the native rfsim hub: the gNB writes
an SSB + (PDCCH+PDSCH) sample stream, the UE endpoint reads IQ off the
TCP link, time-syncs on the PSS, decodes PBCH/MIB, then blind-decodes
the DCI and the PDSCH — the 5g_rfsimulator DL path as one test."""
import threading

import numpy as np
import jax.numpy as jnp


def test_rfsim_dl_sync_and_decode():
    from openairinterface5g_tpu.config import make_frame_params
    from openairinterface5g_tpu.models.pbch import (Mib, PbchConfig,
                                                    mib_payload, mib_unpack,
                                                    ssb_generate, ssb_receive)
    from openairinterface5g_tpu.models.pdcch import DciConfig, pdcch_tx_grid
    from openairinterface5g_tpu.models.pdsch import PdschConfig
    from openairinterface5g_tpu.models.pusch import pusch_tx_grid
    from openairinterface5g_tpu.models.sync import initial_sync, ssb_time_signal
    from openairinterface5g_tpu.models.ue import (DCI_A, UeConfig,
                                                  encode_grant,
                                                  ue_receive_slot)
    from openairinterface5g_tpu.phy.ofdm import (extract_from_grid,
                                                 map_to_grid, ofdm_demodulate,
                                                 ofdm_modulate)
    from openairinterface5g_tpu.radio.rfsim import RfSimDevice

    n_prb, cell_id, rnti = 48, 17, 0x1234
    fp = make_frame_params(1, n_prb)
    rng = np.random.default_rng(3)
    port = 47912

    # ---- gNB-side sample stream -----------------------------------------
    pcfg = PbchConfig(n_id=cell_id)
    tile = ssb_generate(pcfg, mib_payload(Mib(), sfn=0)[None])
    ssb_t = np.asarray(ssb_time_signal(fp, tile))[0]
    pad = 600
    sync_len = 2 * fp.samples_per_slot(0)
    sync_sig = np.zeros(sync_len, np.complex64)
    sync_sig[pad: pad + len(ssb_t)] = ssb_t

    pdsch = PdschConfig(mu=1, n_prb=n_prb, mcs=9, rnti=rnti, n_id=cell_id,
                        start_symbol=2, n_symbols=12, dmrs_symbols=(2,))
    tb = jnp.asarray(rng.integers(0, 2, (1, pdsch.tbs)).astype(np.int8))
    grid_re, _ = pusch_tx_grid(pdsch, tb)
    dci_cfg = DciConfig(A=DCI_A, aggregation_level=4, rnti=rnti,
                        n_id=cell_id, coreset_prb=n_prb)
    grant = dict(mcs=9, prb_start=0, n_prb=n_prb, rv=0)
    coreset = pdcch_tx_grid(dci_cfg, jnp.asarray(encode_grant(**grant)[None]))
    grid_re = grid_re.at[:, 0, 0, :].add(coreset)
    slot_sig = np.asarray(
        ofdm_modulate(fp, map_to_grid(fp, grid_re[:, 0]), 0))[0]

    stream = np.concatenate([sync_sig, slot_sig]).astype(np.complex64)
    noise = 0.01 * (rng.normal(size=stream.shape)
                    + 1j * rng.normal(size=stream.shape))
    stream = stream + noise.astype(np.complex64)

    def gnb():
        d = RfSimDevice.listen(port, n_ant=1)
        d.write(0, stream[None])
        d.close()

    t = threading.Thread(target=gnb)
    t.start()

    # ---- UE endpoint: read IQ off the wire, sync, decode -----------------
    ue_dev = RfSimDevice.connect("127.0.0.1", port, n_ant=1)
    rx_sync = ue_dev.read(0, sync_len)[0]
    res = initial_sync(fp, jnp.asarray(rx_sync[None]))
    t0 = int(np.asarray(res["t0"])[0])
    nid = int(np.asarray(res["n_id"])[0])
    assert nid == cell_id
    assert abs(t0 - pad) <= 2

    fft = fp.fft_size
    syms = np.stack([rx_sync[t0 + l * fft: t0 + (l + 1) * fft]
                     for l in range(4)])
    grid = np.fft.fft(syms, axis=-1) / np.sqrt(fft)
    bins = ((fft - 240) // 2 + np.arange(240) - fft // 2) % fft
    payload_d, ok = ssb_receive(PbchConfig(n_id=nid),
                                jnp.asarray(grid[:, bins][None, None]
                                            .astype(np.complex64)))
    assert bool(np.asarray(ok)[0])
    assert int(mib_unpack(np.asarray(payload_d)[0])["sfn"]) == 0

    rx_slot = ue_dev.read(sync_len, fp.samples_per_slot(0))[0]
    ue = UeConfig(mu=1, n_bwp_prb=n_prb, rnti=rnti, n_id=cell_id,
                  coreset_prb=n_prb)
    re_grid = extract_from_grid(
        fp, ofdm_demodulate(fp, jnp.asarray(rx_slot[None, None]), 0))
    out = ue_receive_slot(ue, re_grid, n_iters=10)
    ue_dev.close()
    t.join()
    assert out["tb_bits"] is not None
    assert bool(np.asarray(out["tb_ok"])[0])
    assert bool(jnp.all(out["tb_bits"] == tb))
