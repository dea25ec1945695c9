"""FAPI message codec + PNF/VNF UDP split tests (C8 / nfapi analog)."""
from __future__ import annotations

import threading

import numpy as np
import pytest

from openairinterface5g_tpu.fapi import messages as m
from openairinterface5g_tpu.fapi.transport import FapiEndpoint, Pnf, Vnf


def roundtrip(msg):
    buf = m.pack_message(msg)
    out = m.unpack_message(buf)
    assert out == msg
    return out


def test_p5_roundtrip():
    roundtrip(m.ConfigRequest(mu=1, n_bwp_prb=273, n_cell_id=42,
                              n_ant_dl=2, ssb_offset_point_a=12, n_ant_ul=4))
    roundtrip(m.ConfigResponse(error_code=0))
    roundtrip(m.StartRequest())
    roundtrip(m.StopRequest())


def test_dl_tti_roundtrip():
    msg = m.DlTtiRequest(
        sfn=12, slot=3,
        pdsch=(m.PdschPdu(rnti=0x46, mcs=16, rb_size=273, n_layers=2,
                          dmrs_symb_pos=(2, 11)),),
        ssb=(m.SsbPduMsg(phys_cell_id=7, prb_offset=4, start_symbol=2),),
        pdcch=(m.PdcchPdu(rnti=0x46, payload_bits=39,
                          payload=bytes([1, 2, 3, 4, 5])),),
    )
    roundtrip(msg)


def test_ul_tti_roundtrip():
    msg = m.UlTtiRequest(
        sfn=1023, slot=19,
        pusch=(m.PuschPduMsg(rnti=0x1234, mcs=9, rb_size=106, rv=2,
                             harq_process_id=5, new_data=0),
               m.PuschPduMsg(rnti=0x77, rb_start=50, rb_size=25,
                             transform_precoding=1)),
        pucch=(m.PucchPduMsg(rnti=0x88, format_type=0, prb_start=270,
                             initial_cyclic_shift=6, n_bits=2),),
        prach=(m.PrachPduMsg(prach_format=0, root_sequence_index=22),),
    )
    roundtrip(msg)


def test_indication_roundtrips():
    roundtrip(m.SlotIndication(sfn=5, slot=7))
    roundtrip(m.RxDataIndication(sfn=1, slot=2,
                                 pdus=((0, 0x46, b"\xde\xad\xbe\xef"),)))
    roundtrip(m.CrcIndication(sfn=1, slot=2, crcs=((0, 0x46, 3, True),
                                                   (1, 0x77, 0, False))))
    roundtrip(m.UciIndication(sfn=1, slot=2,
                              ucis=((0x88, 0, b"\x01", True),)))
    roundtrip(m.RachIndication(sfn=1, slot=2, preambles=((23, 144, -10),)))
    roundtrip(m.SrsIndication(sfn=1, slot=2, reports=((0x46, 1250),)))
    roundtrip(m.TxDataRequest(sfn=1, slot=2, payloads=(b"abc", b"", b"xyz")))


def test_pusch_pdu_config_adapter():
    pdu = m.PuschPduMsg(rnti=0x46, mcs=16, mcs_table=1, rb_start=10,
                        rb_size=50, n_layers=2, dmrs_symb_pos=(2, 11))
    cfg = m.pusch_pdu_to_config(pdu, n_rx=2, n_bwp_prb=106)
    assert cfg.n_prb == 50 and cfg.prb_start == 10 and cfg.n_layers == 2
    assert cfg.dmrs_symbols == (2, 11)
    back = m.config_to_pusch_pdu(cfg, rv=2, harq_id=3, new_data=False)
    assert back.rb_size == 50 and back.rv == 2 and back.harq_process_id == 3


def test_pnf_vnf_split_loopback():
    """Two endpoints exchange a 4-slot run with a stub PHY — the process
    split seam of nfapi_pnf.c/nfapi_vnf.c exercised end-to-end over UDP."""
    pnf_ep = FapiEndpoint()
    vnf_ep = FapiEndpoint()
    pnf_ep.connect(vnf_ep.addr)
    vnf_ep.connect(pnf_ep.addr)

    phy_log = []

    def phy_slot_fn(config, dl, ul, txd):
        phy_log.append((dl.slot, len(dl.pdsch), len(ul.pusch)))
        inds = []
        if ul.pusch:
            inds.append(m.CrcIndication(
                sfn=ul.sfn, slot=ul.slot,
                crcs=tuple((p.handle, p.rnti, p.harq_process_id, True)
                           for p in ul.pusch)))
            inds.append(m.RxDataIndication(
                sfn=ul.sfn, slot=ul.slot,
                pdus=tuple((p.handle, p.rnti, b"\x00" * 8)
                           for p in ul.pusch)))
        return inds

    got = []

    def mac_slot_fn(sfn, slot):
        dl = m.DlTtiRequest(sfn=sfn, slot=slot,
                            pdsch=(m.PdschPdu(rnti=0x46),) if slot % 2 == 0 else ())
        ul = m.UlTtiRequest(sfn=sfn, slot=slot,
                            pusch=(m.PuschPduMsg(rnti=0x46, handle=slot),))
        txd = m.TxDataRequest(sfn=sfn, slot=slot,
                              payloads=(b"pay",) if dl.pdsch else ())
        return dl, ul, txd

    pnf = Pnf(pnf_ep, phy_slot_fn)
    vnf = Vnf(vnf_ep, mac_slot_fn, on_indication=got.append)

    t = threading.Thread(target=lambda: (pnf.serve_control(), pnf.run_slots(4)))
    t.start()
    vnf.configure(m.ConfigRequest(mu=1, n_bwp_prb=106))
    vnf.run_slots(4)
    t.join(timeout=10)
    assert not t.is_alive()
    assert len(phy_log) == 4
    crcs = [g for g in got if isinstance(g, m.CrcIndication)]
    assert len(crcs) == 4 and all(c.crcs[0][3] for c in crcs)
    pnf_ep.close()
    vnf_ep.close()
