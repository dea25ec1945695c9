"""L2-lite tests: MAC PF scheduler, RLC UM/AM, PDCP+security, SDAP."""
from __future__ import annotations

import numpy as np
import pytest

from openairinterface5g_tpu.fapi import messages as fapi
from openairinterface5g_tpu.l2 import mac, pdcp, rlc, sdap
from openairinterface5g_tpu.l2.security import Aes128, aes_cmac, nea2, nia2


# ---- security primitives against published vectors ----

def test_aes128_fips197():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = Aes128(key).encrypt_block(pt)
    assert ct == bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")


def test_aes_cmac_rfc4493():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    assert aes_cmac(key, b"") == bytes.fromhex("bb1d6929e95937287fa37d129b756746")
    m = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert aes_cmac(key, m) == bytes.fromhex("070a16b46b4d4144f79bdd9dd04a287c")
    m40 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a"
                        "ae2d8a571e03ac9c9eb76fac45af8e51"
                        "30c81c46a35ce411")
    assert aes_cmac(key, m40) == bytes.fromhex(
        "dfa66747de9ae63030ca32611497c827")


def test_nea2_involutive_nia2_checks():
    key = bytes(range(16))
    data = bytes(np.random.default_rng(0).integers(0, 256, 100, dtype=np.uint8))
    c = nea2(key, count=7, bearer=3, direction=1, data=data)
    assert c != data
    assert nea2(key, 7, 3, 1, c) == data
    mac1 = nia2(key, 7, 3, 1, data)
    assert len(mac1) == 4
    assert nia2(key, 8, 3, 1, data) != mac1


# 3GPP TS 33.401 C.1 test set 1 for 128-EEA2 (NEA2 is the same algorithm)
def test_nea2_3gpp_testset1():
    key = bytes.fromhex("d3c5d592327fb11c4035c6680af8c6d1")
    count = 0x398a59b4
    bearer = 0x15
    direction = 1
    pt = bytes.fromhex("981ba6824c1bfb1ab485472029b71d808ce33e2cc3c0b5fc1f3de8a6dc66b1f0")
    ct = nea2(key, count, bearer, direction, pt)
    assert ct == bytes.fromhex(
        "e9fed8a63d155304d71df20bf3e82214b20ed7dad2f233dc3c22d7bdeeed8e78")


def test_nia2_distinct_inputs():
    """NIA2 MAC changes with every protected field (count/bearer/dir/msg).
    (The official 33.401 C.2 vectors use bit-exact 58-bit messages; PDCP
    only ever integrity-protects byte-aligned PDUs, which RFC 4493 vectors
    above cover at the CMAC layer.)"""
    key = bytes.fromhex("2bd6459f82c5b300952c49104881ff48")
    base = nia2(key, 0x38a6f056, 0x18, 0, b"34567890")
    assert base != nia2(key, 0x38a6f057, 0x18, 0, b"34567890")
    assert base != nia2(key, 0x38a6f056, 0x19, 0, b"34567890")
    assert base != nia2(key, 0x38a6f056, 0x18, 1, b"34567890")
    assert base != nia2(key, 0x38a6f056, 0x18, 0, b"34567891")


# ---- RLC ----

def test_rlc_um_segmentation_reassembly():
    got = []
    tx = rlc.RlcUm(lambda d: None)
    rx = rlc.RlcUm(got.append)
    sdu = bytes(range(200))
    tx.sdu_in(sdu)
    pdus = []
    while True:
        p = tx.pdu_out(60)
        if p is None:
            break
        pdus.append(p)
    assert len(pdus) >= 4
    for p in pdus:
        rx.pdu_in(p)
    assert got == [sdu]


def test_rlc_um_out_of_order_and_timeout():
    got = []
    tx = rlc.RlcUm(lambda d: None)
    rx = rlc.RlcUm(got.append, t_reassembly_slots=5)
    tx.sdu_in(bytes(100))
    pdus = []
    while (p := tx.pdu_out(40)) is not None:
        pdus.append(p)
    rx.pdu_in(pdus[2])
    rx.pdu_in(pdus[0])
    rx.pdu_in(pdus[1])
    assert got == [bytes(100)]
    # lost last segment -> timeout discards
    got.clear()
    tx.sdu_in(bytes(100))
    pdus = []
    while (p := tx.pdu_out(40)) is not None:
        pdus.append(p)
    rx.pdu_in(pdus[0])
    rx.tick(100)
    assert got == [] and not rx.rx_segs


def test_rlc_am_ack_and_retx():
    got = []
    maxed = []
    a = rlc.RlcAm(lambda d: None, on_max_retx=maxed.append)
    b = rlc.RlcAm(got.append)
    sdus = [bytes([i]) * 20 for i in range(6)]
    for s in sdus:
        a.sdu_in(s)
    pdus = []
    while (p := a.pdu_out(100)) is not None:
        pdus.append(p)
    # drop pdu 2, deliver rest
    for i, p in enumerate(pdus):
        if i != 2:
            b.pdu_in(p)
    assert got == sdus[:2]          # in-order delivery stalls at gap
    st = b.status_out()
    assert st is not None
    a.pdu_in(st)                    # NACK for sn=2 -> retransmit
    p = a.pdu_out(100)
    assert p is not None
    b.pdu_in(p)
    assert got == sdus              # gap filled, all delivered
    st2 = b.status_out()
    if st2:
        a.pdu_in(st2)
    assert not maxed


def test_rlc_am_max_retx_notification():
    maxed = []
    a = rlc.RlcAm(lambda d: None, max_retx=2, on_max_retx=maxed.append)
    a.sdu_in(b"x" * 10)
    p = a.pdu_out(100)
    assert p is not None
    for _ in range(4):
        a.retx.append(0)
        a.pdu_out(100)
    assert 0 in maxed


# ---- PDCP ----

@pytest.mark.parametrize("sn_bits", [12, 18])
def test_pdcp_roundtrip_ciphered_integrity(sn_bits):
    got = []
    cfg_tx = pdcp.PdcpConfig(sn_bits=sn_bits, integrity=True,
                             key_enc=bytes(range(16)),
                             key_int=bytes(range(16, 32)),
                             direction=pdcp.DIR_DL)
    cfg_rx = pdcp.PdcpConfig(sn_bits=sn_bits, integrity=True,
                             key_enc=bytes(range(16)),
                             key_int=bytes(range(16, 32)),
                             direction=pdcp.DIR_UL)
    tx = pdcp.PdcpEntity(cfg_tx, lambda d: None)
    rx = pdcp.PdcpEntity(cfg_rx, got.append)
    msgs = [bytes([i]) * (10 + i) for i in range(5)]
    pdus = [tx.sdu_in(m) for m in msgs]
    for p in pdus:
        rx.pdu_in(p)
    assert got == msgs


def test_pdcp_integrity_failure_detected():
    fails = []
    cfg = pdcp.PdcpConfig(integrity=True, direction=pdcp.DIR_DL)
    cfg_rx = pdcp.PdcpConfig(integrity=True, direction=pdcp.DIR_UL)
    tx = pdcp.PdcpEntity(cfg, lambda d: None)
    rx = pdcp.PdcpEntity(cfg_rx, lambda d: None,
                         on_integrity_fail=fails.append)
    pdu = bytearray(tx.sdu_in(b"hello world"))
    pdu[-1] ^= 0xFF
    assert rx.pdu_in(bytes(pdu)) is None
    assert fails


def test_pdcp_reordering():
    got = []
    tx = pdcp.PdcpEntity(pdcp.PdcpConfig(direction=pdcp.DIR_DL), lambda d: None)
    rx = pdcp.PdcpEntity(pdcp.PdcpConfig(direction=pdcp.DIR_UL), got.append)
    pdus = [tx.sdu_in(bytes([i]) * 8) for i in range(3)]
    rx.pdu_in(pdus[1])
    assert got == []
    rx.pdu_in(pdus[0])
    assert len(got) == 2
    rx.pdu_in(pdus[2])
    assert len(got) == 3


# ---- SDAP ----

def test_sdap_mapping():
    sent, up = [], []
    ent = sdap.SdapEntity(sdap.SdapConfig(dl_header=True, ul_header=True),
                          lambda drb, d: sent.append((drb, d)),
                          lambda qfi, d: up.append((qfi, d)))
    ent.map_flow(qfi=5, drb=2)
    ent.sdu_in(5, b"data")
    assert sent == [(2, bytes([0x80 | 5]) + b"data")]
    ent.pdu_in(2, bytes([0x80 | 5]) + b"uplink")
    assert up == [(5, b"uplink")]


# ---- MAC PF scheduler ----

def test_mac_pf_schedules_by_buffer_and_cqi():
    s = mac.MacScheduler(mac.SchedulerConfig(n_bwp_prb=106))
    s.add_ue(0x46, cqi=12, dl_buffer=50000, ul_buffer=10000)
    s.add_ue(0x47, cqi=5, dl_buffer=500)
    dl, ul, txd = s.schedule_slot(0, 0)
    assert len(dl.pdsch) == 2 and len(txd.payloads) == 2
    assert len(ul.pusch) == 1
    # PRBs disjoint and within BWP
    spans = sorted((p.rb_start, p.rb_start + p.rb_size) for p in dl.pdsch)
    assert all(a2 <= b1 for (_, a2), (b1, _) in zip(spans, spans[1:]))
    assert spans[-1][1] <= 106
    # the high-CQI big-buffer UE gets more PRBs
    by_rnti = {p.rnti: p for p in dl.pdsch}
    assert by_rnti[0x46].rb_size > by_rnti[0x47].rb_size


def test_mac_harq_retransmission_flow():
    s = mac.MacScheduler(mac.SchedulerConfig(n_bwp_prb=106))
    s.add_ue(0x46, cqi=9, ul_buffer=5000)
    _, ul, _ = s.schedule_slot(0, 0)
    assert len(ul.pusch) == 1 and ul.pusch[0].new_data == 1
    pdu = ul.pusch[0]
    # NACK -> retransmission with next rv, same harq process
    s.on_crc(fapi.CrcIndication(crcs=((pdu.handle, 0x46,
                                       pdu.harq_process_id, False),)))
    _, ul2, _ = s.schedule_slot(0, 1)
    retx = [p for p in ul2.pusch if p.new_data == 0]
    assert retx and retx[0].rv == 2
    assert retx[0].harq_process_id == pdu.harq_process_id
    # ACK clears it
    s.on_crc(fapi.CrcIndication(crcs=((retx[0].handle, 0x46,
                                       retx[0].harq_process_id, True),)))
    ue = s.ues[0x46]
    assert not ue.ul_harq[pdu.harq_process_id].active


def test_mac_link_adaptation_backoff():
    s = mac.MacScheduler(mac.SchedulerConfig())
    ue = s.add_ue(0x46, cqi=12, ul_buffer=10**6)
    for slot in range(30):
        _, ul, _ = s.schedule_slot(0, slot)
        for p in ul.pusch:
            s.on_crc(fapi.CrcIndication(
                crcs=((p.handle, 0x46, p.harq_process_id, False),)))
    assert ue.mcs_offset < 0


def test_mac_rach_queues():
    s = mac.MacScheduler(mac.SchedulerConfig())
    s.on_rach(fapi.RachIndication(preambles=((23, 100, -5),)))
    assert s.ra_queue == [(23, 100)]


def test_mac_sib1_paging_and_tdd_gating():
    """SIB1 periodicity, paging PF/PO (38.304 §7.1), and TDD slot-type
    gating of the scheduler (gNB_scheduler.c:252 analog)."""
    from openairinterface5g_tpu.l2.mac import MacScheduler, SchedulerConfig
    from openairinterface5g_tpu.runtime.tdd import TddConfig

    cfg = SchedulerConfig(sib1_payload=b"SIB1-ENCODED", sib1_period_frames=16,
                          drx_cycle_frames=32, paging_n=4,
                          tdd=TddConfig.from_string("7,6,2,4"))
    mac = MacScheduler(cfg)
    ue = mac.add_ue(0x4601)
    ue.dl_buffer = 500
    ue.ul_buffer = 500

    # SIB1 appears at sfn multiple of the period, slot 0 (a D slot)
    dl, ul, txd = mac.schedule_slot(sfn=16, slot=0)
    si = [p for p in dl.pdsch if p.rnti == MacScheduler.SI_RNTI]
    assert si and txd.payloads[0] == b"SIB1-ENCODED"
    dl2, _, _ = mac.schedule_slot(sfn=17, slot=0)
    assert not any(p.rnti == MacScheduler.SI_RNTI for p in dl2.pdsch)

    # paging: ue_id=5 -> PF at sfn mod 32 == 8*(5 mod 4) = 8, PO slot 1
    mac.page_ue(5, b"PAGE-5")
    dl3, _, txd3 = mac.schedule_slot(sfn=8, slot=1)
    pg = [p for p in dl3.pdsch if p.rnti == MacScheduler.P_RNTI]
    assert pg and b"PAGE-5" in b"".join(txd3.payloads)
    assert not mac.paging_queue                    # drained
    mac.page_ue(5, b"PAGE-5")
    dl4, _, _ = mac.schedule_slot(sfn=9, slot=1)   # wrong PF
    assert not any(p.rnti == MacScheduler.P_RNTI for p in dl4.pdsch)

    # TDD gating: slot 8 is U (pattern DDDDDDDSUU) -> no DL PDUs, UL ok
    ue.dl_buffer = 500
    dl5, ul5, _ = mac.schedule_slot(sfn=0, slot=8)
    assert not dl5.pdsch and ul5.pusch
    # slot 3 is D -> DL ok, no UL
    ue.dl_buffer = 500
    dl6, ul6, _ = mac.schedule_slot(sfn=0, slot=3)
    assert dl6.pdsch and not ul6.pusch


def test_srs_drives_ul_link_adaptation():
    """srs_report -> MacScheduler.on_srs: the sounded UL channel sets the
    UL MCS independently of the DL CQI (srs_rx.c -> scheduler feed)."""
    import numpy as np
    import jax.numpy as jnp
    from openairinterface5g_tpu.models.srs import SrsConfig, srs_tx, srs_report
    from openairinterface5g_tpu.l2.mac import MacScheduler, SchedulerConfig

    cfg = SrsConfig(n_prb=24, n_ports=2)
    tx = srs_tx(cfg, 1)
    rng = np.random.default_rng(0)
    H = jnp.asarray((rng.normal(size=(1, 2, 2))
                     + 1j * rng.normal(size=(1, 2, 2))).astype(np.complex64))
    noise = 0.01 * jnp.asarray((rng.normal(size=(1, 2, 288))
                                + 1j * rng.normal(size=(1, 2, 288))
                                ).astype(np.complex64))
    rx = jnp.einsum("brp,bpm->brm", H, tx) + noise
    rep = srs_report(cfg, rx)
    assert float(np.asarray(rep["wideband_snr_db"])[0]) > 10.0
    assert rep["subband_snr_db"].shape == (1, 4)
    mac = MacScheduler(SchedulerConfig())
    ue = mac.add_ue(0x77, cqi=3)          # pessimistic DL CQI
    mac.on_srs(0x77, {"ul_cqi": int(np.asarray(rep["ul_cqi"])[0]),
                      "pmi": int(np.asarray(rep["pmi"])[0])})
    ue.ul_buffer = 1 << 16
    _, ul, _ = mac.schedule_slot(0, 0)
    from openairinterface5g_tpu.l2.mac import cqi_to_mcs
    # UL MCS follows the SRS-derived CQI, not the DL CQI 3
    assert ul.pusch[0].mcs == cqi_to_mcs(ue.ul_cqi, ue.mcs_offset)
    assert ul.pusch[0].mcs > cqi_to_mcs(3, ue.mcs_offset)


def test_bwp_switching():
    """DCI-indicated bandwidth-part switch: allocations follow the
    active BWP window (38.213 §12 switch semantics)."""
    from openairinterface5g_tpu.l2.mac import MacScheduler, SchedulerConfig
    mac = MacScheduler(SchedulerConfig(n_bwp_prb=106))
    ue = mac.add_ue(0x31, cqi=9, bwps=((0, 48), (48, 58)))
    ue.dl_buffer = 1 << 20
    dl, _, _ = mac.schedule_slot(0, 0)
    p = dl.pdsch[0]
    assert p.rb_start >= 0 and p.rb_start + p.rb_size <= 48
    # ack the TB so the process frees, then switch
    mac.on_dl_ack(0x31, p.harq_process_id, True)
    mac.switch_bwp(0x31, 1)
    ue.dl_buffer = 1 << 20
    dl2, _, _ = mac.schedule_slot(0, 1)
    p2 = dl2.pdsch[0]
    assert p2.rb_start >= 48 and p2.rb_start + p2.rb_size <= 106
    # the grant codec carries the indicator
    from openairinterface5g_tpu.models.ue import decode_grant, encode_grant
    g = decode_grant(encode_grant(mcs=9, prb_start=48, n_prb=58, bwp=1))
    assert g["bwp"] == 1 and g["prb_start"] == 48


def test_ra_loss_and_backoff_paths():
    """RA beyond the happy path (38.321 §5.1): RAR window expiry retries
    up to max_attempts, a RAR for another preamble is ignored, and a
    contention-resolution mismatch returns to IDLE for a new attempt."""
    from openairinterface5g_tpu.l2.ue_mac import RaConfig, UeMac

    # RAR never arrives: window expiry keeps retrying, then gives up
    mac = UeMac(RaConfig(preamble_index=9, max_attempts=3,
                         response_window_slots=5))
    slot = 0
    retries = 0
    while True:
        mac.start_ra(slot, b"REQ")
        slot = mac.window_end + 1
        if not mac.ra_timeout(slot):
            break
        retries += 1
    assert mac.state == "IDLE" and mac.attempts == 3 and retries == 2

    # RAR for a different preamble is ignored; ours is honored
    mac = UeMac(RaConfig(preamble_index=9))
    mac.start_ra(0, b"REQ")
    assert mac.on_rar(1, {"preamble_index": 4, "tc_rnti": 0x11}) is None
    assert mac.state == "RA_PREAMBLE"
    m3 = mac.on_rar(2, {"preamble_index": 9, "tc_rnti": 0x22,
                        "ul_grant": {}, "ta": 5})
    assert m3 is not None and mac.state == "RA_MSG3"

    # late RAR (after the window) is ignored
    mac2 = UeMac(RaConfig(preamble_index=9, response_window_slots=3))
    mac2.start_ra(0, b"REQ")
    assert mac2.on_rar(10, {"preamble_index": 9, "tc_rnti": 0x33}) is None

    # contention loss: another UE's msg3 echoed -> back to IDLE
    assert mac.on_contention_resolution(0x22, b"OTHER-UE-MSG3") is False
    assert mac.state == "IDLE" and mac.c_rnti is None
    # a fresh attempt can then win
    mac.start_ra(20, b"REQ")
    mac.on_rar(21, {"preamble_index": 9, "tc_rnti": 0x44, "ul_grant": {},
                    "ta": 0})
    assert mac.on_contention_resolution(0x44, b"REQ") is True
    assert mac.c_rnti == 0x44


def test_connected_mode_drx():
    """38.321 §5.7 C-DRX: UEs outside Active Time are not scheduled;
    a grant restarts the inactivity timer extending Active Time."""
    from openairinterface5g_tpu.l2.mac import MacScheduler, SchedulerConfig
    mac = MacScheduler(SchedulerConfig(n_bwp_prb=52))
    ue = mac.add_ue(0x21, cqi=9, drx_cycle=16, drx_on_duration=2,
                    drx_inactivity=3)

    def sched(slot):
        ue.dl_buffer = 1 << 16
        for h in ue.dl_harq:            # keep processes free
            h.active = False
        dl, _, _ = mac.schedule_slot(0, slot)
        return len(dl.pdsch) > 0

    assert sched(0) and sched(1)        # onDuration slots 0..1
    # slot 1's grant restarted inactivity: active until slot 1+3
    assert sched(2) and sched(3)
    # let the inactivity timer die: no grant at slot 3+... stop granting
    ue.drx_inactive_until = -1
    assert not sched(8)                 # mid-cycle, asleep
    assert not sched(15)
    assert sched(16)                    # next cycle's onDuration
