"""UE MAC <-> PHY seam (fapi/ue_if.py, nr_ue_if_module analog): the MAC
fills dl/ul config requests; the PHY executes them and answers with
indications — the UE PHY runs behind the interface, not hard-wired."""
import numpy as np
import jax.numpy as jnp

from openairinterface5g_tpu.config import make_frame_params
from openairinterface5g_tpu.fapi.ue_if import (DlConfigRequest, DlDciSearch,
                                               DlSsbSearch, UePhy,
                                               UlConfigRequest, UlPrachPdu,
                                               UlPucchPdu, UlPuschPdu)
from openairinterface5g_tpu.models.gnb import (PdcchPdu, SlotDlConfig, SsbPdu,
                                               gnb_dl_slot, gnb_ul_slot,
                                               SlotUlConfig)
from openairinterface5g_tpu.models.pbch import Mib, PbchConfig, mib_payload
from openairinterface5g_tpu.models.pdcch import DciConfig
from openairinterface5g_tpu.models.pdsch import PdschConfig
from openairinterface5g_tpu.models.pucch import Pucch0Config
from openairinterface5g_tpu.models.pusch import PuschConfig
from openairinterface5g_tpu.models.ue import DCI_A, encode_grant
from openairinterface5g_tpu.phy.ofdm import extract_from_grid, ofdm_demodulate


def test_ue_dl_through_seam():
    """gNB slot (SSB + DCI + PDSCH) -> UE PHY behind dl_config_request
    returns the MIB, the grant, and the decoded TB in one indication."""
    bwp, rnti, cell = 48, 0x1234, 31
    fp = make_frame_params(1, bwp)
    rng = np.random.default_rng(2)
    pdsch = PdschConfig(mu=1, n_prb=12, prb_start=24, n_bwp_prb=bwp, mcs=9,
                        rnti=rnti, n_id=cell, start_symbol=2, n_symbols=12,
                        dmrs_symbols=(2,))
    tb = rng.integers(0, 2, (1, pdsch.tbs)).astype(np.int8)
    grant = encode_grant(mcs=9, prb_start=24, n_prb=12)
    dl = SlotDlConfig(
        mu=1, n_bwp_prb=bwp, pdsch=(pdsch,),
        ssb=SsbPdu(PbchConfig(n_id=cell), prb_offset=1, start_symbol=8),
        pdcch=(PdcchPdu(DciConfig(A=DCI_A, rnti=rnti, n_id=cell,
                                  coreset_prb=24, aggregation_level=4)),))
    tx, _ = gnb_dl_slot(dl, [jnp.asarray(tb)],
                        mib_payload(Mib(), sfn=0)[None],
                        dci_payloads=[jnp.asarray(grant[None])])
    grid = extract_from_grid(fp, ofdm_demodulate(fp, tx, 0))

    phy = UePhy(mu=1, n_bwp_prb=bwp)
    req = DlConfigRequest(slot=0,
                          dci=(DlDciSearch(rnti=rnti, coreset_prb=24,
                                           n_id=cell),),
                          ssb=DlSsbSearch(n_id=cell, prb_offset=1,
                                          start_symbol=8))
    ind = phy.handle_dl(req, grid)
    assert ind.mib is not None
    assert ind.dci and ind.dci[0]["mcs"] == 9
    bits, ok = ind.pdsch[0]
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(bits), tb)


def test_ue_ul_through_seam():
    """UE MAC's ul_config_request (PUSCH + PUCCH) -> PHY composes the
    slot; the gNB decodes both from the transmitted waveform."""
    bwp = 48
    pusch = PuschConfig(mu=1, n_prb=24, prb_start=0, n_bwp_prb=bwp, mcs=4,
                        n_symbols=13)
    p0 = Pucch0Config(n_bits=1, n_symbols=1, start_symbol=13)
    rng = np.random.default_rng(3)
    tb = rng.integers(0, 2, (1, pusch.tbs)).astype(np.int8)
    phy = UePhy(mu=1, n_bwp_prb=bwp)
    req = UlConfigRequest(slot=0,
                          pusch=(UlPuschPdu(pusch, jnp.asarray(tb)),),
                          pucch=(UlPucchPdu(p0, jnp.asarray([1]), prb=40),))
    tx = phy.handle_ul(req)
    assert tx is not None
    ul = SlotUlConfig(mu=1, n_bwp_prb=bwp, pusch=(pusch,),
                      pucch0=((p0, 40),))
    out = gnb_ul_slot(ul, tx, n_iters=10)
    assert bool(np.asarray(out["crc_indication"][0]["tb_ok"]).all())
    np.testing.assert_array_equal(np.asarray(out["rx_data"][0]), tb)
    assert int(np.asarray(out["uci0"][0]["uci"])[0]) == 1


def test_ue_prach_through_seam():
    from openairinterface5g_tpu.models.prach import PrachTdConfig, prach_td_rx
    bwp = 48
    fp = make_frame_params(1, bwp)
    pcfg = PrachTdConfig(fmt="A2", mu=1, sample_rate=fp.sample_rate,
                         roots=(1, 2, 3, 4), n_cs=23, threshold=8.0)
    phy = UePhy(mu=1, n_bwp_prb=bwp)
    tx = phy.handle_ul(UlConfigRequest(slot=1,
                                       prach=(UlPrachPdu(pcfg, 17),)))
    det = prach_td_rx(pcfg, np.asarray(tx)[:, :, : pcfg.n_samples])
    assert bool(np.asarray(det["detected"])[0])
    assert int(np.asarray(det["preamble"])[0]) == 17
