"""End-to-end 5G call flow across layers — the analog of the
reference CI's 5g_rfsimulator attach/PDU-session test
(ci-scripts/xml_files/container_5g_rfsim*.xml):

  PRACH over the PHY -> RACH.indication -> RAR -> msg3 (RRCSetupRequest
  carried in a real PUSCH transport block) -> RRC setup -> NAS
  registration through NGAP -> security -> DRB over PDCP(NEA2)/RLC ->
  GTP-U user plane.
"""
import numpy as np
import jax.numpy as jnp


def _bytes_to_bits(data: bytes, n_bits: int) -> np.ndarray:
    arr = np.frombuffer(data, np.uint8)
    bits = np.unpackbits(arr)
    out = np.zeros(n_bits, np.int8)
    out[: min(len(bits), n_bits)] = bits[: n_bits]
    return out


def _bits_to_bytes(bits: np.ndarray) -> bytes:
    return np.packbits(bits.astype(np.uint8)).tobytes()


def test_full_call_flow():
    from openairinterface5g_tpu.fapi import messages as fapi
    from openairinterface5g_tpu.l2.mac import MacScheduler, SchedulerConfig
    from openairinterface5g_tpu.l2.ue_mac import UeMac
    from openairinterface5g_tpu.l3.nas import AmfStub, UeNas
    from openairinterface5g_tpu.l3.ngap import AmfNgapStub, GnbNgap
    from openairinterface5g_tpu.l3.rrc import GnbRrc, UeRrc, decode_ul
    from openairinterface5g_tpu.models.prach import (PrachConfig, prach_rx,
                                                     prach_tx)
    from openairinterface5g_tpu.models.pusch import (PuschConfig, pusch_rx,
                                                     pusch_tx)

    rng = np.random.default_rng(0)

    # ---- 1. PRACH: UE MAC starts RA, preamble goes over the PHY ----------
    ue_mac = UeMac()
    ra_req = ue_mac.start_ra(slot=0, msg3_payload=b"")   # payload set below
    pcfg = PrachConfig()
    tx_p = prach_tx(pcfg, jnp.asarray([ra_req["preamble_index"]]))
    noise = 0.05 * (rng.normal(size=tx_p.shape) + 1j * rng.normal(size=tx_p.shape))
    det = prach_rx(pcfg, (tx_p + noise.astype(np.complex64))[:, None, :])
    assert bool(np.asarray(det["detected"])[0])
    preamble = int(np.asarray(det["preamble"])[0])
    assert preamble == ra_req["preamble_index"]

    # ---- 2. RACH.indication -> gNB MAC RA queue -> RAR (msg2) ------------
    gnb_mac = MacScheduler(SchedulerConfig())
    gnb_mac.on_rach(fapi.RachIndication(
        sfn=0, slot=1, preambles=((preamble, int(np.asarray(det["delay"])[0]), 0),)))
    assert gnb_mac.ra_queue
    tc_rnti = 0x4601
    msg3 = ue_mac.on_rar(5, {"preamble_index": preamble,
                             "tc_rnti": tc_rnti, "ul_grant": 64})
    assert msg3 is not None and msg3["rnti"] == tc_rnti

    # ---- 3. msg3: RRCSetupRequest inside a real PUSCH transport block ----
    ue_rrc = UeRrc()
    gnb_rrc = GnbRrc(cell_id=1)
    ul_pdus, dl_pdus = [], []
    ue_rrc.send_ul = lambda srb, pdu: ul_pdus.append(pdu)
    gnb_rrc.send_dl = lambda rnti, srb, pdu: dl_pdus.append(pdu)
    ue_rrc.connect(nas_pdu=b"")                    # emits rrcSetupRequest
    rrc_pdu = ul_pdus.pop(0)
    ue_mac.msg3_payload = rrc_pdu                  # the actual msg3 CCCH SDU

    ucfg = PuschConfig(mu=1, n_prb=6, mcs=4, n_layers=1, n_rx=1, rnti=tc_rnti)
    payload = len(rrc_pdu).to_bytes(2, "big") + rrc_pdu
    tb = jnp.asarray(_bytes_to_bits(payload, ucfg.tbs)[None])
    tx_u, _ = pusch_tx(ucfg, tb)
    noise_u = 0.02 * (rng.normal(size=(1, 1, tx_u.shape[-1]))
                      + 1j * rng.normal(size=(1, 1, tx_u.shape[-1])))
    out = pusch_rx(ucfg, tx_u + noise_u.astype(np.complex64), n_iters=12)
    assert bool(out["tb_ok"][0])
    rx_bytes = _bits_to_bytes(np.asarray(out["tb_bits"][0]))
    ln = int.from_bytes(rx_bytes[:2], "big")
    rx_rrc_pdu = rx_bytes[2: 2 + ln]
    name, _ = decode_ul(rx_rrc_pdu)
    assert name == "rrcSetupRequest"

    # ---- 4. msg4: RRC setup + contention resolution ----------------------
    gnb_rrc.handle_ul(tc_rnti, rx_rrc_pdu)
    assert ue_mac.on_contention_resolution(tc_rnti, rx_rrc_pdu)
    assert ue_mac.state == "CONNECTED" and ue_mac.c_rnti == tc_rnti
    ue_rrc.handle_dl(0, dl_pdus.pop(0))            # rrcSetup -> complete
    gnb_rrc.handle_ul(tc_rnti, ul_pdus.pop(0))
    assert gnb_rrc.ue[tc_rnti].state == "CONNECTED"

    # ---- 5. NAS registration + PDU session through NGAP ------------------
    ue_nas, amf_nas = UeNas(), AmfStub()
    dl_nas = []
    gnb_ngap = GnbNgap(nas_downstream=lambda rnti, pdu: dl_nas.append(pdu))
    amf_ngap = AmfNgapStub(nas_handler=amf_nas)
    gnb_ngap.send, amf_ngap.send = amf_ngap.handle, gnb_ngap.handle
    gnb_ngap.ng_setup()
    ran_id = gnb_ngap.initial_ue_message(tc_rnti, ue_nas.start())
    for _ in range(10):
        if not dl_nas:
            break
        for up in ue_nas.handle(dl_nas.pop(0)):
            gnb_ngap.uplink_nas(ran_id, up)
    assert ue_nas.state == "SESSION" and ue_nas.ip == "10.0.0.2"
    sessions = gnb_ngap.ue[ran_id]["sessions"]
    assert sessions

    # ---- 6. security + DRB: PDCP(NEA2/NIA2) over RLC UM ------------------
    from openairinterface5g_tpu.l2.pdcp import PdcpConfig, PdcpEntity
    from openairinterface5g_tpu.l2.rlc import RlcUm
    gnb_rrc.start_security(tc_rnti)
    ue_rrc.handle_dl(1, dl_pdus.pop(0))
    gnb_rrc.handle_ul(tc_rnti, ul_pdus.pop(0))
    assert gnb_rrc.ue[tc_rnti].security_on

    key = bytes(range(16))
    got_dl = []
    from openairinterface5g_tpu.l2.pdcp import DIR_DL, DIR_UL
    pdcp_gnb = PdcpEntity(
        PdcpConfig(bearer_id=1, ciphering=True, integrity=True,
                   key_enc=key, key_int=key, direction=DIR_DL),
        deliver=lambda p: None)
    pdcp_ue = PdcpEntity(
        PdcpConfig(bearer_id=1, ciphering=True, integrity=True,
                   key_enc=key, key_int=key, direction=DIR_UL),
        deliver=got_dl.append)
    rlc_gnb = RlcUm(deliver=lambda p: pdcp_ue.pdu_in(p))
    ip_pkt = b"E\x00\x00\x28" + bytes(36)          # IPv4-ish payload
    rlc_gnb.sdu_in(pdcp_gnb.sdu_in(ip_pkt))
    while True:
        pdu = rlc_gnb.pdu_out(60)
        if pdu is None:
            break
        rlc_gnb.pdu_in(pdu)                        # loop to peer reassembly
    assert got_dl == [ip_pkt]

    # ---- 7. GTP-U to the core -------------------------------------------
    from openairinterface5g_tpu.l3.gtpu import GtpuEndpoint
    got_upf = []
    upf = GtpuEndpoint(deliver=lambda sid, p: got_upf.append(p))
    gnb_up = GtpuEndpoint(transport=upf.receive)
    gnb_up.add_session(1, local_teid=0x10, remote_teid=sessions[0]["teid"])
    upf.add_session(1, local_teid=sessions[0]["teid"], remote_teid=0x10)
    gnb_up.send(1, ip_pkt)
    assert got_upf == [ip_pkt]
