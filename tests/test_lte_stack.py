"""LTE stack above the PHY: RRC connection, eNB MAC scheduling, PUCCH
format 2, and the lte-softmodem loop (scheduled TBs both directions)."""
import numpy as np
import jax.numpy as jnp


def test_lte_rrc_connection():
    from openairinterface5g_tpu.lte.rrc import EnbRrc, LteUeRrc
    dl_q, ul_q = [], []
    enb = EnbRrc(send=lambda rnti, pdu: dl_q.append(pdu))
    ue = LteUeRrc(send=lambda pdu: ul_q.append(pdu))
    ue.connect()
    enb.on_ccch(0x4444, ul_q.pop(0))
    while dl_q or ul_q:
        if dl_q:
            ue.on_dl(dl_q.pop(0))
        if ul_q:
            enb.on_dcch(0x4444, ul_q.pop(0))
    assert enb.ues[0x4444].state == "ACTIVE" and ue.state == "ACTIVE"
    assert ue.drbs == (1,)
    enb.release(0x4444)
    ue.on_dl(dl_q.pop(0))
    assert ue.state == "IDLE"


def test_lte_pucch2_cqi():
    from openairinterface5g_tpu.lte.pucch import (LtePucch2Config, pucch2_rx,
                                                  pucch2_tx)
    rng = np.random.default_rng(0)
    cfg = LtePucch2Config(n_rb=25, cell_id=17, prb=1, cs0=3, rnti=0x4321,
                          n_bits=7)
    bits = jnp.asarray(rng.integers(0, 2, (4, 7)).astype(np.int8))
    g = pucch2_tx(cfg, bits)
    noise = 0.15 * jnp.asarray((rng.normal(size=(4, 1, 14, 300))
                                + 1j * rng.normal(size=(4, 1, 14, 300))
                                ).astype(np.complex64))
    out = pucch2_rx(cfg, g[:, None] + noise)
    assert (np.asarray(out["uci"]) == np.asarray(bits)).all()
    assert np.asarray(out["detected"]).all()
    dtx = pucch2_rx(cfg, noise)
    assert not np.asarray(dtx["detected"]).any()


def test_lte_mac_harq_and_adaptation():
    from openairinterface5g_tpu.lte.mac import (EnbScheduler,
                                                EnbSchedulerConfig)
    mac = EnbScheduler(EnbSchedulerConfig(n_rb=25))
    mac.add_ue(0x77, cqi=10)
    g0 = mac.schedule_dl(0x77)
    assert g0["ndi"] == 1 and g0["rv"] == 0
    mac.on_dl_ack(0x77, g0["harq_id"], False)
    g1 = mac.schedule_dl(0x77)
    assert g1["ndi"] == 0 and g1["rv"] == 2 \
        and g1["harq_id"] == g0["harq_id"]
    mac.on_dl_ack(0x77, g1["harq_id"], True)
    g2 = mac.schedule_dl(0x77)
    assert g2["ndi"] == 1
    # synchronous UL HARQ: retx lands on the same sf%8 process
    u0 = mac.schedule_ul(0x77, 3)
    mac.on_ulsch_crc(0x77, 3, False)
    u1 = mac.schedule_ul(0x77, 11)
    assert u1["ndi"] == 0 and u1["rv"] == 2 and u1["harq_id"] == 3


def test_lte_softmodem_loop():
    from openairinterface5g_tpu.runtime.lte_softmodem import run_loop
    st = run_loop(n_cycles=4, log=lambda *a: None)
    assert st["rrc_msgs"] >= 7
    assert st["dl_ack"] > 0 and st["ul_ok"] > 0
    assert st["dl_mbps"] > 0 and st["ul_mbps"] > 0
