"""Group / sequence hopping for low-PAPR sequences (TS 38.211 §6.3.2.2.1
PUCCH, §6.4.1.1.1.2 transform-precoded PUSCH DMRS).

The reference computes f_gh/v per slot inside the sequence generators
(openair1/PHY/NR_UE_TRANSPORT/pucch_nr.c, nr_ul_ref.c); here the (u, v)
pair is a host-side pure function of (hopping config, slot, hop index)
so jitted TX/RX programs stay static per configuration.

Modes (pucch-GroupHopping / NR higher-layer param):
  'neither' — f_gh = 0, v = 0
  'enable'  — group hopping: f_gh = Gold bits per (slot, hop), v = 0
  'disable' — sequence hopping: f_gh = 0, v = Gold bit per (slot, hop)
              (v only applies to sequences of length >= 6 PRB; callers
              pass m_zc so short sequences force v = 0 per the spec).
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=64)
def _gold_bits_host(cinit: int, length: int) -> np.ndarray:
    """Host-side 38.211 §5.2.1 Gold sequence (numpy twin of
    phy/scrambling.gold_sequence for config-time use)."""
    Nc = 1600
    n = length + Nc
    x1 = np.zeros(n + 31, np.int8)
    x2 = np.zeros(n + 31, np.int8)
    x1[0] = 1
    for i in range(31):
        x2[i] = (cinit >> i) & 1
    for i in range(n):
        x1[i + 31] = x1[i + 3] ^ x1[i]
        x2[i + 31] = x2[i + 3] ^ x2[i + 2] ^ x2[i + 1] ^ x2[i]
    return (x1[Nc:Nc + length] ^ x2[Nc:Nc + length]).astype(np.int8)


def group_sequence_uv(hopping_id: int, mode: str, slot: int, hop: int = 0,
                      m_zc: int = 12, symbols_per_slot: int = 14) -> tuple[int, int]:
    """-> (u, v) for the low-PAPR sequence of (slot, intra-slot hop).

    TS 38.211 §6.3.2.2.1: u = (f_gh + f_ss) mod 30 with f_ss =
    hopping_id mod 30; group hopping draws 8 Gold bits per hop index
    n = 2*slot + hop seeded floor(hopping_id/30); sequence hopping draws
    one bit per hop (v), only for M_ZC >= 6*12 subcarriers.
    """
    f_ss = hopping_id % 30
    if mode == "neither":
        return f_ss, 0
    n_hop = 2 * slot + hop
    if mode == "enable":
        c = _gold_bits_host(hopping_id // 30, 8 * (n_hop + 1))
        seg = c[8 * n_hop: 8 * n_hop + 8].astype(np.int64)
        f_gh = int((seg * (1 << np.arange(8))).sum() % 30)
        return (f_gh + f_ss) % 30, 0
    if mode == "disable":
        v = 0
        if m_zc >= 6 * 12:
            c = _gold_bits_host((hopping_id // 30 << 5) + f_ss, n_hop + 1)
            v = int(c[n_hop])
        return f_ss, v
    raise ValueError(f"unknown hopping mode {mode!r}")
