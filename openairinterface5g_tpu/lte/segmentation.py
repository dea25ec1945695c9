"""LTE code block segmentation (TS 36.212 §5.1.2) — the 4G analog of
coding/segmentation.py (reference: openair1/PHY/CODING/lte_segmentation.c).

Turbo code block sizes come from the 188-entry QPP table
(data/lte_tables.py); unlike NR's two (Kcb, Kb) classes, LTE picks the
smallest table K fitting B'/C, possibly mixing two sizes K-/K+ (the
first C- blocks are short).  Filler bits F pad the FIRST block and are
transmitted as <NULL> (skipped by rate matching).
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ..data.lte_tables import QPP_BY_K
from ..coding.crc import crc_attach

Z_MAX = 6144
_K_TABLE = np.array(sorted(QPP_BY_K.keys()), np.int64)


@dataclasses.dataclass(frozen=True)
class LteSegParams:
    B: int          # input bits incl. TB CRC
    C: int          # number of code blocks
    c_minus: int    # blocks of size k_minus (first c_minus blocks)
    k_minus: int
    k_plus: int
    F: int          # filler bits (start of block 0)

    @property
    def block_sizes(self) -> tuple:
        return (self.k_minus,) * self.c_minus + (self.k_plus,) * (self.C - self.c_minus)

    @property
    def cb_crc(self) -> bool:
        return self.C > 1


@functools.lru_cache(maxsize=64)
def segment_params(B: int) -> LteSegParams:
    if B <= Z_MAX:
        L, C, Bp = 0, 1, B
    else:
        L = 24
        C = -(-B // (Z_MAX - L))
        Bp = B + C * L
    k_plus = int(_K_TABLE[np.searchsorted(_K_TABLE, -(-Bp // C))])
    if C == 1:
        k_minus, c_minus = 0, 0
    else:
        k_minus = int(_K_TABLE[np.searchsorted(_K_TABLE, k_plus) - 1])
        c_minus = (C * k_plus - Bp) // (k_plus - k_minus)
    c_plus = C - c_minus
    F = c_plus * k_plus + c_minus * k_minus - Bp
    return LteSegParams(B=B, C=C, c_minus=c_minus, k_minus=k_minus,
                        k_plus=k_plus, F=F)


def segment_tb(tb_with_crc: jnp.ndarray, p: LteSegParams) -> list:
    """(batch, B) bits -> list of (batch, C_g, K_g) per size group.

    Groups: [(K-, first c_minus blocks)] then [(K+, rest)].  Each block
    gets CRC24B when C > 1; block 0 is prefixed with F filler zeros.
    """
    B = tb_with_crc.shape[0]
    L = 24 if p.C > 1 else 0
    groups = []
    pos = 0
    for K, cnt, first in _groups(p):
        data_len = K - L
        blocks = []
        for r in range(cnt):
            take = data_len - (p.F if (first and r == 0) else 0)
            blk = tb_with_crc[:, pos: pos + take]
            if first and r == 0 and p.F:
                blk = jnp.concatenate(
                    [jnp.zeros((B, p.F), blk.dtype), blk], axis=-1)
            pos += take
            if L:
                blk = crc_attach(blk.astype(jnp.int8), "24B")
            blocks.append(blk)
        groups.append(jnp.stack(blocks, axis=1))        # (batch, cnt, K)
    return groups


def desegment_tb(groups: list, p: LteSegParams) -> jnp.ndarray:
    """Inverse of segment_tb: decoded blocks -> (batch, B) TB (+TB CRC)."""
    L = 24 if p.C > 1 else 0
    parts = []
    gi = 0
    for K, cnt, first in _groups(p):
        blocks = groups[gi]
        gi += 1
        for r in range(cnt):
            blk = blocks[:, r, : K - L]
            if first and r == 0 and p.F:
                blk = blk[:, p.F:]
            parts.append(blk)
    return jnp.concatenate(parts, axis=-1)


def _groups(p: LteSegParams):
    """[(K, count, contains_block0)] in transmission order."""
    out = []
    if p.c_minus:
        out.append((p.k_minus, p.c_minus, True))
    out.append((p.k_plus, p.C - p.c_minus, p.c_minus == 0))
    return out
