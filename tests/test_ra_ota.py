"""Over-the-air random access through the native rfsim hub.

gNB and UE endpoints run concurrently; every RA message (SSB, PRACH,
msg2 RAR, msg3, msg4, HARQ-ACK) crosses the TCP IQ link as samples —
the 5g_rfsimulator RA flow with no message-bus shortcuts."""
import threading

from openairinterface5g_tpu.runtime import ra_ota


def test_ra_over_the_air():
    port = 47031
    res = {}

    def gnb():
        res["gnb"] = ra_ota.run_gnb(port)

    t = threading.Thread(target=gnb)
    t.start()
    res["ue"] = ra_ota.run_ue(port)
    t.join(timeout=300)
    assert res.get("gnb") is True, "gNB did not complete the RA"
    assert res.get("ue") is True, "UE did not obtain a C-RNTI"
