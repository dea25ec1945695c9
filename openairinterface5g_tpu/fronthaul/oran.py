"""O-RAN 7.2x split fronthaul framing analog (eCPRI + section type 1).

The reference's fhi_72 radio (radio/fhi_72/oaioran.c:25) carries the
7.2 split over DPDK/xran: eCPRI-encapsulated C-plane section headers +
U-plane IQ with per-PRB block-floating-point compression (udCompHdr).
This is the clean-room framing analog over plain UDP sockets — the
packet grammar and BFP compression, not the DPDK transport:

eCPRI common header (4 bytes, eCPRI spec 3.1.3.1.1):
  byte 0: protocol rev (4b) | reserved (3b) | C=0 (concatenation)
  byte 1: message type (0 = IQ data, 2 = real-time control)
  bytes 2-3: payload size (big-endian)

Application header (8 bytes, O-RAN WG4 CUS 5.4.4 shape):
  pcid/rtcid (2B) | seqid (2B) | frame (1B) | subframe(4b)|slot-hi(4b)
  | slot-lo(2b)|startSym(6b) | numPrb (1B)

Section type 1 U-plane payload per PRB: udCompHdr (1 B: 4b exponent,
4b method=1 BFP) + 12 IQ pairs of `iq_width`-bit mantissas (9-bit
default packed big-endian, as the xran default).
"""
from __future__ import annotations

import dataclasses
import struct

import numpy as np

ECPRI_IQ = 0
ECPRI_RTC = 2
IQ_WIDTH = 9                     # xran default mantissa width


def _bfp_compress_prb(iq: np.ndarray, width: int = IQ_WIDTH) -> bytes:
    """(12,) complex -> udCompHdr + packed mantissas (O-RAN BFP)."""
    flat = np.empty(24, np.float64)
    flat[0::2] = iq.real
    flat[1::2] = iq.imag
    mx = np.max(np.abs(flat))
    # exponent: shift so the max fits the signed `width`-bit mantissa
    exp = 0
    scale = (1 << (width - 1)) - 1
    if mx > 0:
        while mx / (1 << exp) > 1.0 and exp < 15:
            exp += 1
        # normalize to <=1.0 then to mantissa range
    q = np.clip(np.round(flat / (1 << exp) * scale), -(scale + 1), scale
                ).astype(np.int64)
    bits = []
    for v in q:
        bits.extend(((int(v) & ((1 << width) - 1)) >> (width - 1 - i)) & 1
                    for i in range(width))
    bits.extend([0] * (-len(bits) % 8))
    payload = bytes(sum(bits[i + j] << (7 - j) for j in range(8))
                    for i in range(0, len(bits), 8))
    return bytes([(exp << 4) | 0x1]) + payload


def _bfp_decompress_prb(buf: bytes, width: int = IQ_WIDTH) -> np.ndarray:
    exp = buf[0] >> 4
    scale = (1 << (width - 1)) - 1
    bits = []
    for b in buf[1:]:
        bits.extend((b >> (7 - j)) & 1 for j in range(8))
    out = np.empty(24, np.float64)
    for k in range(24):
        v = 0
        for i in range(width):
            v = (v << 1) | bits[k * width + i]
        if v >= (1 << (width - 1)):
            v -= 1 << width
        out[k] = v / scale * (1 << exp)
    return (out[0::2] + 1j * out[1::2]).astype(np.complex64)


@dataclasses.dataclass
class OranUPlane:
    pcid: int
    seqid: int
    frame: int
    subframe: int
    slot: int
    start_sym: int
    iq: np.ndarray                # (n_prb, 12) complex64


def pack_uplane(m: OranUPlane) -> bytes:
    n_prb = m.iq.shape[0]
    body = bytearray()
    body += struct.pack(">HHB", m.pcid, m.seqid, m.frame & 0xFF)
    body.append(((m.subframe & 0xF) << 4) | ((m.slot >> 2) & 0xF))
    body.append(((m.slot & 0x3) << 6) | (m.start_sym & 0x3F))
    body.append(n_prb & 0xFF)
    for p in range(n_prb):
        body += _bfp_compress_prb(np.asarray(m.iq[p]))
    hdr = bytes([0x10, ECPRI_IQ]) + struct.pack(">H", len(body))
    return hdr + bytes(body)


def unpack_uplane(buf: bytes) -> OranUPlane:
    rev, typ = buf[0], buf[1]
    assert rev >> 4 == 1 and typ == ECPRI_IQ, (rev, typ)
    (size,) = struct.unpack(">H", buf[2:4])
    body = buf[4: 4 + size]
    pcid, seqid, frame = struct.unpack(">HHB", body[:5])
    subframe = body[5] >> 4
    slot = ((body[5] & 0xF) << 2) | (body[6] >> 6)
    start_sym = body[6] & 0x3F
    n_prb = body[7]
    per = 1 + (24 * IQ_WIDTH + 7) // 8
    iq = np.stack([
        _bfp_decompress_prb(body[8 + p * per: 8 + (p + 1) * per])
        for p in range(n_prb)])
    return OranUPlane(pcid, seqid, frame, subframe, slot, start_sym, iq)


def symbol_to_uplane(pcid: int, seq0: int, frame: int, subframe: int,
                     slot: int, sym: int, re_row: np.ndarray,
                     max_prb_per_pkt: int = 64) -> list[bytes]:
    """One OFDM symbol's occupied REs -> eCPRI U-plane datagrams."""
    n_prb = len(re_row) // 12
    iq = np.asarray(re_row[: 12 * n_prb]).reshape(n_prb, 12)
    out = []
    seq = seq0
    for p0 in range(0, n_prb, max_prb_per_pkt):
        out.append(pack_uplane(OranUPlane(
            pcid, seq & 0xFFFF, frame, subframe, slot, sym,
            iq[p0: p0 + max_prb_per_pkt])))
        seq += 1
    return out
