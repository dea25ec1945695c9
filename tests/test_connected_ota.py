"""Connected-mode steady-state data plane over the native rfsim hub.

gNB (MacScheduler-driven) and UE endpoints run concurrently for 8
4-slot cycles: PDCCH DL+UL grants, PDSCH/PUSCH transport blocks, PUCCH
F0 HARQ-ACK + F2 CQI — every bit over the TCP IQ link.  The noise level
is set so HARQ retransmissions genuinely occur and are recovered by
soft combining (runtime/connected_ota.py)."""
import threading

from openairinterface5g_tpu.runtime import connected_ota


def test_connected_data_plane():
    port = 47121
    res = {}

    def gnb():
        res["gnb"] = connected_ota.run_gnb(port, n_cycles=8,
                                           log=lambda *a: None)

    t = threading.Thread(target=gnb)
    t.start()
    res["ue"] = connected_ota.run_ue(port, n_cycles=8, log=lambda *a: None)
    t.join(timeout=420)
    st = res.get("gnb")
    assert isinstance(st, dict), "gNB endpoint did not finish"
    assert st["slots"] >= 32
    assert st["dl_ack"] > 0 and st["dl_mbps"] > 0, st
    assert st["ul_ok"] > 0 and st["ul_mbps"] > 0, st
    # the aggressive CQI bias makes round-0 failures near-certain at the
    # adapted MCS; soft-combining must recover at least one of them
    assert st["dl_retx"] + st["ul_retx"] >= 1, st
    assert st["dl_ack"] + st["ul_ok"] > st["dl_retx"] + st["ul_retx"] - 2


def test_connected_user_plane_over_the_air():
    """PDCP(NEA2) + RLC AM user plane inside the OTA transport blocks:
    seq-stamped packets delivered bit-intact both directions, with HARQ
    retransmissions underneath (and RLC ARQ above for exhausted ones)."""
    port = 47122
    res = {}

    def gnb():
        res["gnb"] = connected_ota.run_gnb(port, n_cycles=8,
                                           log=lambda *a: None,
                                           l2_stack=True)

    t = threading.Thread(target=gnb)
    t.start()
    res["ue"] = connected_ota.run_ue(port, n_cycles=8, log=lambda *a: None,
                                     l2_stack=True)
    t.join(timeout=420)
    st = res.get("gnb")
    assert isinstance(st, dict), "gNB endpoint did not finish"
    assert st["ul_pkts"] > 0 and st["ul_pkts_intact"] == st["ul_pkts"], st
    assert res["ue"].get("dl_pkts", 0) > 0, res["ue"]


def test_gtpu_to_drb_user_plane():
    """Core-to-UE user plane: an N3 GTP-U G-PDU is decapsulated at the
    gNB, rides the DRB (PDCP NEA2 + RLC AM + MAC framing) across a lossy
    TB channel, and the UE delivers the exact inner IP packet; the UL
    direction re-encapsulates the UE's packet toward the core."""
    from openairinterface5g_tpu.l2.pdcp import DIR_DL, DIR_UL
    from openairinterface5g_tpu.l2.userplane import DrbStack
    from openairinterface5g_tpu.l3.gtpu import GtpuEndpoint, encode_gpdu

    gnb_drb = DrbStack(DIR_DL)
    ue_drb = DrbStack(DIR_UL)
    # N3 tunnel: the gNB endpoint decapsulates into the DRB
    gnb_gtp = GtpuEndpoint(
        deliver=lambda sid, pay: gnb_drb.send_packet(pay))
    gnb_gtp.add_session(5, local_teid=0x1111, remote_teid=0x2222)
    ip_pkt = b"E\x00\x01\x00" + bytes(range(128)) * 2
    gnb_gtp.receive(encode_gpdu(0x1111, ip_pkt))

    # DRB across TBs with the first TB lost (RLC ARQ recovers)
    lost = gnb_drb.fill_tb(200)                 # dropped
    assert lost is not None
    for _ in range(8):
        gnb_drb.drain_tb(ue_drb.fill_tb(120))
        ue_drb.drain_tb(gnb_drb.fill_tb(200))
    assert ue_drb.delivered and ue_drb.delivered[0] == ip_pkt

    # UL: UE packet rides the DRB up, gNB re-encapsulates toward the core
    up = b"E\x00\x00\x40" + bytes(60)
    ue_drb.send_packet(up)
    for _ in range(6):
        gnb_drb.drain_tb(ue_drb.fill_tb(200))
        ue_drb.drain_tb(gnb_drb.fill_tb(120))
    assert gnb_drb.delivered and gnb_drb.delivered[0] == up
    n1_pkt = gnb_gtp.send(5, gnb_drb.delivered[0])
    if n1_pkt is not None:
        from openairinterface5g_tpu.l3.gtpu import decode
        hdr, inner = decode(n1_pkt)
        assert inner == up and hdr.teid == 0x2222
