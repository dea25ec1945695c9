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
