"""LTE PUCCH formats 1/1a/1b (TS 36.211 §5.4.1) — SR and 1/2-bit
HARQ-ACK on one PRB pair.

Reference: openair1/PHY/LTE_TRANSPORT/pucch.c (generate_pucch1x /
uci decoding).  Structure per slot (normal CP): the length-12 base
sequence r_{u,v} with a per-symbol cyclic shift (cell Gold-hopped),
data on symbols {0,1,5,6} spread by a length-4 Walsh cover, DMRS on
symbols {2,3,4} spread by a length-3 DFT cover; the second slot hops
to the mirrored PRB.  TPU design: the whole (14, 12) PRB tile is one
tensor; detection is a single matched correlation against the known
cover/shift structure (format 1a/1b symbol decided by the phase).
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ..phy.refsig import low_papr_sequence
from ..phy.scrambling import gold_sequence_np

_W4 = np.array([[1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1]], np.float32)
_W3 = np.exp(2j * np.pi * np.outer([0, 1, 2], [0, 1, 2]) / 3).astype(np.complex64)
_DATA_SYMS = (0, 1, 5, 6)
_DMRS_SYMS = (2, 3, 4)


@dataclasses.dataclass(frozen=True)
class LtePucch1Config:
    n_rb: int = 25
    cell_id: int = 0
    prb: int = 0                  # slot-0 PRB (slot 1 mirrors)
    n_oc: int = 0                 # orthogonal cover index (0..2)
    cs0: int = 0                  # base cyclic shift alpha index (0..11)
    n_rx: int = 1

    @property
    def mirror_prb(self) -> int:
        return self.n_rb - 1 - self.prb


@functools.lru_cache(maxsize=64)
def _ncs_cell(cell_id: int) -> np.ndarray:
    """(20, 7) per-(slot, symbol) cell cyclic-shift hop (36.211 §5.4:
    n_cs^cell from the cell Gold sequence, 8 bits per symbol)."""
    c = gold_sequence_np(cell_id, 8 * 7 * 20)
    bits = c.reshape(20, 7, 8)
    return (bits * (1 << np.arange(8))).sum(-1) % 12


def _base(cfg: LtePucch1Config) -> np.ndarray:
    u = cfg.cell_id % 30
    return low_papr_sequence(u, 0, 12)


def _slot_tile(cfg: LtePucch1Config, d: jnp.ndarray, ns: int) -> jnp.ndarray:
    """One slot's (7, 12) PUCCH tile for modulation symbol d (B,)."""
    r = _base(cfg)
    ncs = _ncs_cell(cfg.cell_id)[ns % 20]
    k = np.arange(12)
    cols = []
    w4 = _W4[cfg.n_oc]
    w3 = _W3[cfg.n_oc]
    di = 0
    for l in range(7):
        alpha = 2 * np.pi * ((cfg.cs0 + int(ncs[l])) % 12) / 12
        seq = r * np.exp(1j * alpha * k)
        if l in _DMRS_SYMS:
            cols.append(jnp.asarray(seq * w3[_DMRS_SYMS.index(l)])[None]
                        * jnp.ones_like(d[:, None]))
        else:
            cols.append(d[:, None] * float(w4[di]) * jnp.asarray(seq)[None])
            di += 1
    return jnp.stack(cols, axis=1)                       # (B, 7, 12)


def pucch1_tx(cfg: LtePucch1Config, bits: jnp.ndarray | None) -> jnp.ndarray:
    """bits: None (format 1 / SR), (B,1) (1a, BPSK) or (B,2) (1b, QPSK)
    -> (B, 14, n_sc) subframe RE grid (both slots, mirrored PRB)."""
    if bits is None:
        d = jnp.ones((1,), jnp.complex64)
    elif bits.shape[-1] == 1:
        d = (1.0 - 2.0 * bits[:, 0]).astype(jnp.complex64)
    else:
        d = ((1.0 - 2.0 * bits[:, 0]) + 1j * (1.0 - 2.0 * bits[:, 1])
             ).astype(jnp.complex64) / np.sqrt(2)
    B = d.shape[0]
    n_sc = 12 * cfg.n_rb
    grid = jnp.zeros((B, 14, n_sc), jnp.complex64)
    t0 = _slot_tile(cfg, d, 0)
    t1 = _slot_tile(cfg, d, 1)
    grid = grid.at[:, 0:7, 12 * cfg.prb: 12 * cfg.prb + 12].set(t0)
    grid = grid.at[:, 7:14, 12 * cfg.mirror_prb: 12 * cfg.mirror_prb + 12].set(t1)
    return grid


def pucch1_rx(cfg: LtePucch1Config, re_grid: jnp.ndarray, n_bits: int = 1):
    """(B, R, 14, n_sc) -> dict(d_hat, bits, detected).

    Channel from the DMRS symbols (per slot), coherent combine of the
    data symbols, metric = |corr| against the DTX threshold."""
    tiles = [re_grid[:, :, 0:7, 12 * cfg.prb: 12 * cfg.prb + 12],
             re_grid[:, :, 7:14, 12 * cfg.mirror_prb: 12 * cfg.mirror_prb + 12]]
    r = _base(cfg)
    k = np.arange(12)
    z = 0.0
    e_dmrs = 0.0
    for ns, tile in enumerate(tiles):
        ncs = _ncs_cell(cfg.cell_id)[ns % 20]
        w4 = _W4[cfg.n_oc]
        w3 = _W3[cfg.n_oc]
        h = 0.0
        for i, l in enumerate(_DMRS_SYMS):
            alpha = 2 * np.pi * ((cfg.cs0 + int(ncs[l])) % 12) / 12
            seq = r * np.exp(1j * alpha * k) * w3[i]
            h = h + tile[:, :, l, :] * jnp.conj(jnp.asarray(seq))
        h = h / 3                                       # (B, R, 12)
        e_dmrs = e_dmrs + jnp.mean(jnp.abs(h) ** 2, axis=(-2, -1))
        for i, l in enumerate(_DATA_SYMS):
            alpha = 2 * np.pi * ((cfg.cs0 + int(ncs[l])) % 12) / 12
            seq = r * np.exp(1j * alpha * k) * float(w4[i])
            z = z + jnp.sum(tile[:, :, l, :] * jnp.conj(jnp.asarray(seq) )
                            * jnp.conj(h), axis=(-2, -1))
    e = jnp.maximum(e_dmrs, 1e-12)
    d_hat = z / (8 * 12 * e[..., None] if z.ndim > e.ndim else 8 * 12 * e)
    if n_bits == 0:
        bits = None
    elif n_bits == 1:
        bits = (jnp.real(d_hat) < 0).astype(jnp.int8)[:, None]
    else:
        bits = jnp.stack([(jnp.real(d_hat) < 0), (jnp.imag(d_hat) < 0)],
                         axis=-1).astype(jnp.int8)
    detected = jnp.abs(d_hat) > 0.25
    return {"d_hat": d_hat, "bits": bits, "detected": detected}
