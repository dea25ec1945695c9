"""RLC AM scenario battery (the nr_rlc/tests golden-trace analog):
segmentation, re-segmentation on retransmission, loss/duplicate/
reordering patterns, SN wraparound, 18-bit SNs, max-retx."""
import numpy as np
import pytest

from openairinterface5g_tpu.l2.rlc import RlcAm


def _link(tx: RlcAm, rx: RlcAm, grant: int, drop=None, dup=None,
          max_pdus: int = 10000):
    """Drive tx->rx with per-PDU grant; drop/dup are predicates on the
    running PDU counter.  Status PDUs flow back rx->tx losslessly."""
    n = 0
    idle = 0
    while idle < 3:
        moved = False
        pdu = tx.pdu_out(grant)
        if pdu is not None:
            n += 1
            moved = True
            if not (drop and drop(n)):
                rx.pdu_in(pdu)
                if dup and dup(n):
                    rx.pdu_in(pdu)
        st = rx.status_out()
        if st is not None:
            tx.pdu_in(st)
            moved = True
        st_tx = tx.status_out()
        if st_tx is not None:
            rx.pdu_in(st_tx)
        idle = 0 if moved else idle + 1
        assert n < max_pdus, "link did not converge"
    return n


def _pair(sn_bits=12, **kw):
    out = []
    rx = RlcAm(out.append, sn_bits=sn_bits, **kw)
    tx = RlcAm(lambda b: None, sn_bits=sn_bits, **kw)
    return tx, rx, out


def test_am_segmentation_roundtrip():
    tx, rx, out = _pair()
    sdus = [bytes([i]) * (50 + 40 * i) for i in range(5)]
    for s in sdus:
        tx.sdu_in(s)
    _link(tx, rx, grant=64)
    assert out == sdus


def test_am_large_sdu_tiny_grants():
    tx, rx, out = _pair()
    sdu = bytes(range(256)) * 8            # 2048 bytes through 16-byte grants
    tx.sdu_in(sdu)
    _link(tx, rx, grant=16)
    assert out == [sdu]


def test_am_segment_loss_and_resegmented_retx():
    tx, rx, out = _pair()
    sdus = [bytes([i]) * 120 for i in range(6)]
    for s in sdus:
        tx.sdu_in(s)
    # drop every 5th PDU on the first pass; ARQ must recover all
    _link(tx, rx, grant=48, drop=lambda n: n % 5 == 0 and n < 20)
    assert sorted(out) == sorted(sdus)
    assert out == sdus                     # in-order delivery


def test_am_duplicates_are_idempotent():
    tx, rx, out = _pair()
    sdus = [bytes([i]) * 70 for i in range(4)]
    for s in sdus:
        tx.sdu_in(s)
    _link(tx, rx, grant=40, dup=lambda n: n % 2 == 0)
    assert out == sdus


def test_am_out_of_order_segments():
    tx, rx, out = _pair()
    sdu = b"Z" * 100
    tx.sdu_in(sdu)
    pdus = []
    while True:
        p = tx.pdu_out(40)
        if p is None:
            break
        pdus.append(p)
    assert len(pdus) >= 3
    for p in reversed(pdus):               # deliver segments backwards
        rx.pdu_in(p)
    assert out == [sdu]


def test_am_18bit_sn():
    tx, rx, out = _pair(sn_bits=18)
    sdus = [bytes([i]) * 30 for i in range(10)]
    for s in sdus:
        tx.sdu_in(s)
    _link(tx, rx, grant=64)
    assert out == sdus


def test_am_sn_wraparound():
    tx, rx, out = _pair()
    tx.tx_next = tx.tx_acked = 4090
    rx.rx_next = 4090
    sdus = [bytes([i % 251]) * 20 for i in range(16)]   # crosses 4095->0
    for s in sdus:
        tx.sdu_in(s)
    _link(tx, rx, grant=40)
    assert out == sdus
    assert tx.tx_next == (4090 + 16) % 4096


def test_am_loss_with_wraparound():
    tx, rx, out = _pair()
    tx.tx_next = tx.tx_acked = 4094
    rx.rx_next = 4094
    sdus = [bytes([i]) * 25 for i in range(8)]
    for s in sdus:
        tx.sdu_in(s)
    _link(tx, rx, grant=40, drop=lambda n: n in (2, 3))
    assert out == sdus


def test_am_max_retx_notification_with_segments():
    dead = []
    out = []
    rx = RlcAm(out.append)
    tx = RlcAm(lambda b: None, max_retx=2, on_max_retx=dead.append)
    tx.sdu_in(b"A" * 90)
    tx.sdu_in(b"B" * 90)
    # SN0's PDUs are ALWAYS dropped; SN1 arrives, so the receiver's
    # status NACKs SN0 each round until tx gives up at max_retx
    for _ in range(12):
        p = tx.pdu_out(128)
        if p is not None and p[1] == 1:    # SN1 only
            rx.pdu_in(p)
        if p is None:
            rx.status_due = True
            st = rx.status_out()
            if st:
                tx.pdu_in(st)
    assert dead and dead[0] == 0


def test_am_control_pdu_priority():
    tx, rx, out = _pair()
    tx.sdu_in(b"x" * 10)
    p = tx.pdu_out(64)
    rx.pdu_in(p)                           # poll set -> status due
    assert rx.status_due
    assert rx.pdu_out(64) is None          # data blocked until status sent
    assert rx.status_out() is not None
    rx.sdu_in(b"y" * 10)
    assert rx.pdu_out(64) is not None


def test_am_bidirectional_exchange():
    a_out, b_out = [], []
    a = RlcAm(a_out.append)
    b = RlcAm(b_out.append)
    a_sdus = [bytes([i]) * 45 for i in range(6)]
    b_sdus = [bytes([128 + i]) * 60 for i in range(6)]
    for s in a_sdus:
        a.sdu_in(s)
    for s in b_sdus:
        b.sdu_in(s)
    idle = 0
    n = 0
    while idle < 3 and n < 1000:
        moved = False
        for src, dst in ((a, b), (b, a)):
            for is_data in (True, False):
                pdu = src.pdu_out(48) if is_data else src.status_out()
                if pdu is not None:
                    n += 1
                    moved = True
                    if not (is_data and n % 7 == 0):
                        dst.pdu_in(pdu)
        if not moved and (a.wait_ack or b.wait_ack):
            # periodic status (t-Reassembly/t-StatusProhibit analog): a
            # dropped final poll must not stall the link
            a.status_due = b.status_due = True
            moved = True
        idle = 0 if moved else idle + 1
    assert b_out == a_sdus and a_out == b_sdus
