import numpy as np
import jax.numpy as jnp

from openairinterface5g_tpu.models.gnb import (
    SlotDlConfig, SlotUlConfig, SsbPdu, gnb_dl_slot, gnb_ul_slot,
)
from openairinterface5g_tpu.models.pbch import PbchConfig
from openairinterface5g_tpu.models.pdsch import PdschConfig
from openairinterface5g_tpu.models.pucch import Pucch0Config, Pucch2Config, pucch0_tx, pucch2_tx
from openairinterface5g_tpu.models.pusch import PuschConfig, pusch_tx


def test_dl_slot_two_ues_plus_ssb():
    """Two PDSCH allocations + SSB composed on one grid; decode both UEs."""
    from openairinterface5g_tpu.models.pdsch import pdsch_rx
    B = 2
    bwp = 48
    ue1 = PdschConfig(mu=1, n_prb=12, prb_start=24, n_bwp_prb=bwp, mcs=4,
                      rnti=0x100, start_symbol=6, n_symbols=8, dmrs_symbols=(7,))
    ue2 = PdschConfig(mu=1, n_prb=12, prb_start=36, n_bwp_prb=bwp, mcs=9,
                      rnti=0x200, start_symbol=6, n_symbols=8, dmrs_symbols=(7,))
    rng = np.random.default_rng(0)
    tb1 = rng.integers(0, 2, (B, ue1.tbs)).astype(np.int8)
    tb2 = rng.integers(0, 2, (B, ue2.tbs)).astype(np.int8)
    mib = rng.integers(0, 2, (B, 32)).astype(np.int8)
    dl = SlotDlConfig(mu=1, n_bwp_prb=bwp,
                      pdsch=(ue1, ue2),
                      ssb=SsbPdu(PbchConfig(n_id=3), prb_offset=0))
    tx, _ = gnb_dl_slot(dl, [jnp.asarray(tb1), jnp.asarray(tb2)], jnp.asarray(mib))
    assert tx.shape[1] == 1
    # each UE decodes its own allocation from the same waveform
    out1 = pdsch_rx(ue1, tx, n_iters=8)
    out2 = pdsch_rx(ue2, tx, n_iters=8)
    assert bool(out1["tb_ok"].all()) and bool(out2["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out1["tb_bits"]), tb1)
    np.testing.assert_array_equal(np.asarray(out2["tb_bits"]), tb2)


def test_ul_slot_pusch_plus_pucch():
    """PUSCH + PUCCH0 + PUCCH2 in one UL slot, all decoded from one grid."""
    from openairinterface5g_tpu.phy.ofdm import map_to_grid, ofdm_modulate
    from openairinterface5g_tpu.config import make_frame_params

    B = 2
    bwp = 48
    pusch = PuschConfig(mu=1, n_prb=24, prb_start=0, n_bwp_prb=bwp, mcs=4,
                        n_symbols=13)
    p0 = Pucch0Config(n_bits=1, n_symbols=1, start_symbol=13)
    p2 = Pucch2Config(n_bits=6, n_prb=4, n_symbols=1, start_symbol=13)
    rng = np.random.default_rng(1)
    tb = rng.integers(0, 2, (B, pusch.tbs)).astype(np.int8)
    ack = rng.integers(0, 2, B)
    csi = rng.integers(0, 2, (B, 6)).astype(np.int8)

    # build the combined UL waveform: PUSCH samples + PUCCH REs on the grid
    fp = make_frame_params(1, bwp)
    tx_p, _ = pusch_tx(pusch, jnp.asarray(tb))
    grid_re = jnp.zeros((B, 1, fp.symbols_per_slot, fp.n_sc), jnp.complex64)
    seq0 = pucch0_tx(p0, jnp.asarray(ack))           # (B, 1, 12)
    grid_re = grid_re.at[:, 0, 13, 12 * 30: 12 * 31].set(seq0[:, 0])
    re2 = pucch2_tx(p2, jnp.asarray(csi))            # (B, 1, 48)
    grid_re = grid_re.at[:, 0, 13, 12 * 40: 12 * 44].set(re2[:, 0])
    tx_extra = ofdm_modulate(fp, map_to_grid(fp, grid_re), 0)
    rx = tx_p + tx_extra

    ul = SlotUlConfig(mu=1, n_bwp_prb=bwp, pusch=(pusch,),
                      pucch0=((p0, 30),), pucch2=((p2, 40),))
    out = gnb_ul_slot(ul, rx, n_iters=8)
    assert bool(out["crc_indication"][0]["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["rx_data"][0]), tb)
    np.testing.assert_array_equal(np.asarray(out["uci0"][0]["uci"]), ack)
    np.testing.assert_array_equal(np.asarray(out["uci2"][0]["uci"]), csi)


def test_dl_slot_full_composition_with_dci_and_csirs():
    """SSB + PDCCH (grant DCI) + CSI-RS + PDSCH in ONE composed slot; the
    UE blind-decodes the in-slot DCI, configures its PDSCH receiver from
    the grant, decodes the TB, and measures CSI-RS
    (phy_procedures_nr_gNB.c:157-254 in-slot TX analog)."""
    from openairinterface5g_tpu.config import make_frame_params
    from openairinterface5g_tpu.models.csirs import CsirsConfig, csi_measure
    from openairinterface5g_tpu.models.gnb import CsirsPdu, PdcchPdu
    from openairinterface5g_tpu.models.pdcch import DciConfig
    from openairinterface5g_tpu.models.ue import (
        DCI_A, UeConfig, encode_grant, ue_receive_slot)
    from openairinterface5g_tpu.phy.ofdm import extract_from_grid, ofdm_demodulate

    B = 2
    bwp = 48
    rnti = 0x4321
    # CSI-RS rides symbol 1, between the CORESET (0) and the PDSCH
    # (2..13) — PDSCH rate-match around CSI-RS REs is not modeled, so
    # allocations stay disjoint
    pdsch = PdschConfig(mu=1, n_prb=12, prb_start=24, n_bwp_prb=bwp, mcs=9,
                        rnti=rnti, start_symbol=2, n_symbols=12,
                        dmrs_symbols=(2,))
    rng = np.random.default_rng(5)
    tb = rng.integers(0, 2, (B, pdsch.tbs)).astype(np.int8)
    mib = rng.integers(0, 2, (B, 32)).astype(np.int8)
    grant = encode_grant(mcs=9, prb_start=24, n_prb=12)
    dci = jnp.asarray(np.tile(grant, (B, 1)))
    dl = SlotDlConfig(
        mu=1, n_bwp_prb=bwp,
        pdsch=(pdsch,),
        ssb=SsbPdu(PbchConfig(n_id=0), prb_offset=1, start_symbol=8),
        pdcch=(PdcchPdu(DciConfig(A=DCI_A, rnti=rnti, coreset_prb=24,
                                  aggregation_level=4, start_symbol=0)),),
        csirs=(CsirsPdu(CsirsConfig(n_prb=48, symbol=1)),))
    tx, _ = gnb_dl_slot(dl, [jnp.asarray(tb)], jnp.asarray(mib),
                        dci_payloads=[dci])
    fp = make_frame_params(1, bwp)
    re_grid = extract_from_grid(fp, ofdm_demodulate(fp, tx, 0))
    ue = UeConfig(mu=1, n_bwp_prb=bwp, rnti=rnti, coreset_prb=24)
    out = ue_receive_slot(ue, re_grid)
    assert out["grant"] is not None
    assert out["grant"]["mcs"] == 9 and out["grant"]["n_prb"] == 12
    assert bool(np.asarray(out["tb_ok"]).all())
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)
    meas = csi_measure(CsirsConfig(n_prb=48, symbol=1),
                       re_grid[:, :, 1, :])
    assert float(np.asarray(meas["snr_db"]).min()) > 25.0


def test_sib1_broadcast_over_the_grid():
    """SIB1 end to end: RRC encodes it, the MAC schedules the SI-RNTI
    PDSCH (with its CSS DCI), the slot is composed and OFDM'd, and the
    UE blind-decodes with SI-RNTI and parses the SIB1 fields
    (gNB_scheduler.c SIB1 path + UE SI acquisition analog)."""
    from openairinterface5g_tpu.config import make_frame_params
    from openairinterface5g_tpu.l2.mac import MacScheduler, SchedulerConfig
    from openairinterface5g_tpu.l3.rrc import GnbRrc, decode_dl
    from openairinterface5g_tpu.models.gnb import PdcchPdu
    from openairinterface5g_tpu.models.pdcch import DciConfig
    from openairinterface5g_tpu.models.ue import (DCI_A, UeConfig,
                                                  encode_grant,
                                                  ue_receive_slot)
    from openairinterface5g_tpu.phy.ofdm import extract_from_grid, ofdm_demodulate
    from openairinterface5g_tpu.runtime.ra_ota import bytes_to_tb, tb_to_bytes

    bwp, cell = 48, 9
    rrc = GnbRrc(cell_id=cell)
    sib1_pdu = rrc.sib1()

    # MAC schedules the SI-RNTI PDSCH at the SIB1 occasion
    mac = MacScheduler(SchedulerConfig(n_bwp_prb=bwp,
                                       sib1_payload=sib1_pdu,
                                       sib1_prbs=12))
    dl_req, _, txd = mac.schedule_slot(sfn=0, slot=0)
    si = [p for p in dl_req.pdsch if p.rnti == MacScheduler.SI_RNTI]
    assert si and txd.payloads[0] == sib1_pdu

    # compose the slot exactly as scheduled: DCI(SI-RNTI) + PDSCH
    pdsch = PdschConfig(mu=1, n_prb=si[0].rb_size, prb_start=24,
                        n_bwp_prb=bwp, mcs=si[0].mcs,
                        rnti=MacScheduler.SI_RNTI, n_id=cell,
                        start_symbol=2, n_symbols=12, dmrs_symbols=(2,))
    tb = bytes_to_tb(sib1_pdu, pdsch.tbs)[None]
    grant = encode_grant(mcs=si[0].mcs, prb_start=24, n_prb=si[0].rb_size)
    dl = SlotDlConfig(mu=1, n_bwp_prb=bwp, pdsch=(pdsch,),
                      pdcch=(PdcchPdu(DciConfig(
                          A=DCI_A, rnti=MacScheduler.SI_RNTI, n_id=cell,
                          coreset_prb=24, aggregation_level=4)),))
    tx, _ = gnb_dl_slot(dl, [jnp.asarray(tb)],
                        dci_payloads=[jnp.asarray(grant[None])])

    fp = make_frame_params(1, bwp)
    grid = extract_from_grid(fp, ofdm_demodulate(fp, tx, 0))
    ue = UeConfig(mu=1, n_bwp_prb=bwp, rnti=MacScheduler.SI_RNTI,
                  n_id=cell, coreset_prb=24)
    out = ue_receive_slot(ue, grid)
    assert bool(np.asarray(out["tb_ok"]).all())
    rx_pdu = tb_to_bytes(np.asarray(out["tb_bits"])[0], len(sib1_pdu))
    name, msg = decode_dl(rx_pdu)
    assert name == "sib1"
    assert msg["plmn_mcc"] == 1 and msg["prach_config_index"] == 98
