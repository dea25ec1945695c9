"""IF5-analog fronthaul: TIME-domain IQ over UDP (the lower split).

The reference's IF5 split ships raw time-domain antenna samples between
RU and L1 (radio/ETHERNET/, fh_if5_south_out / north_in in
executables/nr-ru.c) — the RU keeps only the RF; OFDM moves to the L1
host.  Packet format mirrors fronthaul/if4p5.py but carries sample
chunks of the slot waveform instead of per-symbol subcarriers.

Header (little-endian, 24 bytes):
  magic   u32  0x49463500 ("IF5\\0")
  type    u8   0 = UL time-domain, 1 = DL time-domain
  frame   u16
  slot    u8
  chunk   u8   chunk index within the slot
  antenna u8
  n_samp  u16  samples in this chunk
  seq     u32
  scale   f32  int16 block-floating-point scale
  pad     u16
payload: n_samp int16 IQ pairs
"""
from __future__ import annotations

import dataclasses
import struct

import numpy as np

MAGIC = 0x49463500
_HDR = struct.Struct("<IBHBBBHIfH")
UL_TD = 0
DL_TD = 1
CHUNK = 2048                      # samples per datagram (8 KB payload)


def pack_chunk(pkt_type: int, frame: int, slot: int, chunk: int,
               antenna: int, seq: int, iq: np.ndarray) -> bytes:
    x = np.asarray(iq, np.complex64)
    scale = float(np.max(np.abs(np.stack([x.real, x.imag])))) or 1.0
    q = np.empty(2 * len(x), np.int16)
    q[0::2] = np.clip(np.round(x.real / scale * 32767), -32768, 32767)
    q[1::2] = np.clip(np.round(x.imag / scale * 32767), -32768, 32767)
    return _HDR.pack(MAGIC, pkt_type, frame, slot, chunk, antenna,
                     len(x), seq, scale, 0) + q.tobytes()


def unpack_chunk(buf: bytes):
    (magic, typ, frame, slot, chunk, ant, n, seq, scale,
     _pad) = _HDR.unpack_from(buf, 0)
    assert magic == MAGIC, f"bad IF5 magic {magic:#x}"
    q = np.frombuffer(buf, np.int16, count=2 * n, offset=_HDR.size)
    iq = (q[0::2].astype(np.float32)
          + 1j * q[1::2].astype(np.float32)) * (scale / 32767.0)
    return typ, frame, slot, chunk, ant, iq.astype(np.complex64)


def slot_to_packets(pkt_type: int, frame: int, slot: int,
                    samples: np.ndarray, seq0: int = 0) -> list[bytes]:
    """(n_ant, n_samp) waveform -> list of chunked datagrams."""
    out = []
    seq = seq0
    for a in range(samples.shape[0]):
        for ci, off in enumerate(range(0, samples.shape[1], CHUNK)):
            out.append(pack_chunk(pkt_type, frame, slot, ci, a, seq,
                                  samples[a, off: off + CHUNK]))
            seq += 1
    return out


def packets_to_slot(bufs: list[bytes], n_ant: int,
                    n_samp: int) -> tuple[int, int, int, np.ndarray]:
    """Reassemble one slot's waveform from its datagrams (any order)."""
    wav = np.zeros((n_ant, n_samp), np.complex64)
    meta = None
    for b in bufs:
        typ, frame, slot, chunk, ant, iq = unpack_chunk(b)
        if meta is None:
            meta = (typ, frame, slot)
        off = chunk * CHUNK
        wav[ant, off: off + len(iq)] = iq
    return (*meta, wav)
