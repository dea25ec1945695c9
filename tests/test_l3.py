"""L3 control-plane tests: PER codec, RRC, NAS, NGAP, GTP-U, SCTP
framing, F1AP, E1AP — the openair2/RRC + openair3 capability set."""
import time

import pytest


def test_per_roundtrip():
    from openairinterface5g_tpu.l3 import per
    schema = per.Seq((
        ("a", per.Int(0, 100), False),
        ("b", per.Enum(("x", "y", "z")), False),
        ("c", per.OctStr(), True),
        ("d", per.SeqOf(per.Int(0, 15)), False),
        ("e", per.BitStr(20), False),
    ))
    v = {"a": 42, "b": "z", "c": b"hello", "d": [1, 2, 3], "e": 0xABCDE >> 4}
    assert per.decode(schema, per.encode(schema, v)) == v
    v2 = dict(v, c=None)
    assert per.decode(schema, per.encode(schema, v2)) == v2


def test_rrc_setup_flow():
    from openairinterface5g_tpu.l3.rrc import GnbRrc, UeRrc
    wires = []
    gnb = GnbRrc(cell_id=7)
    ue = UeRrc()
    gnb.send_dl = lambda rnti, srb, pdu: ue.handle_dl(srb, pdu)
    ue.send_ul = lambda srb, pdu: gnb.handle_ul(0x46, pdu)
    nas_up = []
    gnb.nas_upstream = lambda rnti, pdu: nas_up.append((rnti, pdu))

    ue.connect(nas_pdu=b"REG")
    assert ue.state == "CONNECTED"
    assert gnb.ue[0x46].state == "CONNECTED"
    assert nas_up == [(0x46, b"REG")]
    gnb.start_security(0x46)
    assert ue.security_on and gnb.ue[0x46].security_on
    gnb.setup_drb(0x46, drb_id=2)
    assert ue.drbs == [2]
    assert gnb.ue[0x46].state == "RB_CONFIGURED"
    gnb.release(0x46)
    assert ue.state == "IDLE" and 0x46 not in gnb.ue


def test_nas_registration_flow():
    from openairinterface5g_tpu.l3.nas import AmfStub, UeNas
    amf, ue = AmfStub(), UeNas()
    pending = [ue.start()]
    for _ in range(10):
        if not pending:
            break
        dl = []
        for p in pending:
            dl.extend(amf.handle(p))
        pending = []
        for p in dl:
            pending.extend(ue.handle(p))
    assert amf.state == "SESSION"
    assert ue.state == "SESSION"
    assert ue.ip == "10.0.0.2"


def test_ngap_closed_loop_with_nas():
    from openairinterface5g_tpu.l3.nas import AmfStub, UeNas
    from openairinterface5g_tpu.l3.ngap import AmfNgapStub, GnbNgap

    ue_nas = UeNas()
    dl_nas = []
    gnb = GnbNgap(nas_downstream=lambda rnti, pdu: dl_nas.append((rnti, pdu)))
    amf = AmfNgapStub(nas_handler=AmfStub())
    gnb.send = amf.handle
    amf.send = gnb.handle

    gnb.ng_setup()
    assert gnb.setup_done
    ran_id = gnb.initial_ue_message(0x46, ue_nas.start())
    # pump NAS until session established
    for _ in range(10):
        if not dl_nas:
            break
        _, pdu = dl_nas.pop(0)
        for up in ue_nas.handle(pdu):
            gnb.uplink_nas(ran_id, up)
    assert ue_nas.state == "SESSION"
    assert gnb.ue[ran_id]["sessions"], "PDU session resources set up"


def test_gtpu_roundtrip():
    from openairinterface5g_tpu.l3.gtpu import (GtpuEndpoint, decode,
                                                encode_gpdu)
    pkt = encode_gpdu(0x1234, b"ip-packet", seq=7)
    hdr, payload = decode(pkt)
    assert hdr.teid == 0x1234 and hdr.seq == 7 and payload == b"ip-packet"

    got = []
    b = GtpuEndpoint(deliver=lambda sid, p: got.append((sid, p)))
    a = GtpuEndpoint(transport=b.receive)
    a.add_session(1, local_teid=0x10, remote_teid=0x20)
    b.add_session(1, local_teid=0x20, remote_teid=0x10)
    a.send(1, b"hello-up")
    assert got == [(1, b"hello-up")]


def test_sctp_framing_loopback_and_tcp():
    from openairinterface5g_tpu.l3 import sctp
    got_a, got_b = [], []
    a, b = sctp.loopback_pair(lambda *m: got_a.append(m),
                              lambda *m: got_b.append(m))
    a.send(0, sctp.PPID_NGAP, b"ngap-pdu")
    b.send(1, sctp.PPID_F1AP, b"f1ap-pdu")
    deadline = time.time() + 2
    while (not got_a or not got_b) and time.time() < deadline:
        time.sleep(0.01)
    assert got_b == [(0, sctp.PPID_NGAP, b"ngap-pdu")]
    assert got_a == [(1, sctp.PPID_F1AP, b"f1ap-pdu")]
    a.close()
    b.close()

    got_srv = []
    holder, port, t = sctp.listen(0, lambda *m: got_srv.append(m))
    cli = sctp.connect("127.0.0.1", port, lambda *m: None)
    cli.send(0, sctp.PPID_E1AP, b"e1")
    deadline = time.time() + 2
    while not got_srv and time.time() < deadline:
        time.sleep(0.01)
    assert got_srv == [(0, sctp.PPID_E1AP, b"e1")]
    cli.close()
    if "assoc" in holder:
        holder["assoc"].close()


def test_f1ap_cu_du_split_rrc():
    """Full RRC setup through the F1 split: UE <-> DU <-> CU."""
    from openairinterface5g_tpu.l3.f1ap import CuF1ap, DuF1ap
    from openairinterface5g_tpu.l3.rrc import GnbRrc, UeRrc

    ue = UeRrc()
    rrc = GnbRrc(cell_id=3)
    cu = CuF1ap(rrc)
    du = DuF1ap(du_id=9, cell_id=3,
                deliver_dl=lambda rnti, srb, pdu: ue.handle_dl(srb, pdu))
    cu.send = du.handle
    du.send = cu.handle

    du.f1_setup()
    assert du.setup_done

    first = [True]

    def ue_ul(srb, pdu):
        if first[0]:
            first[0] = False
            du.initial_ul_rrc(0x46, pdu)
        else:
            du.ul_rrc(0x46, srb, pdu)

    ue.send_ul = ue_ul
    ue.connect(nas_pdu=b"REG")
    assert ue.state == "CONNECTED"
    assert rrc.ue[0x46].state == "CONNECTED"
    cu.setup_drb(0x46, drb_id=1)
    assert ue.drbs == [1]
    assert rrc.ue[0x46].state == "RB_CONFIGURED"


def test_e1ap_bearer_context():
    from openairinterface5g_tpu.l3.e1ap import CuCpE1ap, CuUpE1ap
    cp = CuCpE1ap()
    up = CuUpE1ap(cu_up_id=5)
    cp.send = up.handle
    up.send = cp.handle
    up.e1_setup()
    assert cp.setup_done
    cp.setup_bearer(cu_cp_ue_id=1, pdu_session_id=1, drb_id=1, ul_teid=0x2000)
    assert 1 in cp.contexts
    assert cp.contexts[1]["dl_teid"] == up.bearers[cp.contexts[1]["cu_up_ue_id"]]["dl_teid"]
