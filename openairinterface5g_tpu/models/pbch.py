"""PBCH / SSB chain (P20/P29 analog): PSS/SSS/PBCH generation + UE RX.

Reference anchors: TX nr_generate_pbch (openair1/PHY/NR_TRANSPORT/
nr_pbch.c:223) + nr_common_signal_procedures (SCHED_NR/
phy_procedures_nr_gNB.c:48); RX nr_rx_pbch (openair1/PHY/NR_UE_TRANSPORT/
nr_pbch.c:470).

The SSB is a static 240-subcarrier x 4-symbol tile; generation and
reception are pure tensor ops (mapping per TS 38.211 §7.4.3.1).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..coding import polar
from ..coding.crc import crc_attach
from ..phy import refsig
from ..phy.channel_estimation import ls_estimate
from ..phy.llr import llrs as llr_compute
from ..phy.modulation import modulate
from ..phy.scrambling import gold_sequence

# TS 38.212 §7.1.1 PBCH payload interleaving pattern G(j)
PBCH_PAYLOAD_INTERLEAVER = np.array(
    [16, 23, 18, 17, 8, 30, 10, 6, 24, 7, 0, 5, 3, 2, 1, 4,
     9, 11, 12, 13, 14, 15, 19, 20, 21, 22, 25, 26, 27, 28, 29, 31],
    dtype=np.int32,
)

A_PBCH = 32           # payload bits
E_PBCH = 864
K_PBCH = 56           # A + CRC24
N_SSB_SC = 240


@dataclasses.dataclass(frozen=True)
class PbchConfig:
    n_id: int = 0           # physical cell id (0..1007)
    i_ssb: int = 0          # SSB index (Lmax<=8: 3 bits) incl. half-frame
    n_hf: int = 0

    @property
    def v(self) -> int:
        return self.n_id % 4

    @property
    def i_ssb_eff(self) -> int:
        """DMRS index i_ssb + 4*n_hf (TS 38.211 7.4.1.4.1, Lmax=4/8)."""
        return self.i_ssb + 4 * self.n_hf


def _polar_params():
    return polar.polar_params(K=K_PBCH, E=E_PBCH, n_max=9, i_il=True)


def pbch_dmrs(cfg: PbchConfig) -> jnp.ndarray:
    """(144,) QPSK DMRS sequence (TS 38.211 §7.4.1.4)."""
    cinit = ((1 << 11) * (cfg.i_ssb_eff + 1) * (cfg.n_id // 4 + 1)
             + (1 << 6) * (cfg.i_ssb_eff + 1) + (cfg.n_id % 4)) % (1 << 31)
    return refsig.dmrs_sequence(cinit, 144)


def _dmrs_positions(cfg: PbchConfig):
    """(sym, sc) positions of the 144 PBCH DMRS REs within the SSB tile."""
    v = cfg.v
    pos = []
    for k in range(0, 240, 4):
        pos.append((1, v + k))
    for k in range(0, 48, 4):
        pos.append((2, v + k))
    for k in range(192, 240, 4):
        pos.append((2, v + k))
    for k in range(0, 240, 4):
        pos.append((3, v + k))
    return np.array(pos, dtype=np.int32)


def _data_positions(cfg: PbchConfig):
    """(sym, sc) positions of the 432 PBCH data REs (TS 38.211 7.4.3.1-1)."""
    v = cfg.v
    pos = []
    for k in range(240):
        if k % 4 != v:
            pos.append((1, k))
    for k in list(range(48)) + list(range(192, 240)):
        if k % 4 != v:
            pos.append((2, k))
    for k in range(240):
        if k % 4 != v:
            pos.append((3, k))
    return np.array(pos, dtype=np.int32)


def pbch_encode(cfg: PbchConfig, payload: jnp.ndarray) -> jnp.ndarray:
    """(B, 32) payload -> (B, 864) scrambled coded bits.

    Implements payload interleaving (38.212 7.1.1) + CRC24C + polar +
    rate matching + 2nd-level scrambling (38.211 7.3.3.1 with v = i_ssb
    2 LSBs).  1st-level (SFN-based) payload scrambling is the caller's
    concern (it permutes payload bits only).
    """
    p = _polar_params()
    a_int = jnp.take(payload, jnp.asarray(PBCH_PAYLOAD_INTERLEAVER), axis=-1)
    with_crc = crc_attach(a_int.astype(jnp.int8), "24C")
    e = polar.encode(p, with_crc)
    v = cfg.i_ssb % 4
    c = gold_sequence(jnp.uint32(cfg.n_id), (v + 1) * E_PBCH)[v * E_PBCH:]
    return e ^ c


def pbch_decode(cfg: PbchConfig, llr_e: jnp.ndarray, list_size: int = 8):
    """(B, 864) LLRs -> ((B, 32) payload, ok (B,))."""
    p = _polar_params()
    v = cfg.i_ssb % 4
    c = gold_sequence(jnp.uint32(cfg.n_id), (v + 1) * E_PBCH)[v * E_PBCH:]
    llr_d = llr_e * (1.0 - 2.0 * c.astype(llr_e.dtype))
    bits, ok = polar.decode_with_crc(p, llr_d, "24C", list_size=list_size)
    inv = np.argsort(PBCH_PAYLOAD_INTERLEAVER)
    return jnp.take(bits, jnp.asarray(inv), axis=-1), ok


def ssb_generate(cfg: PbchConfig, payload: jnp.ndarray) -> jnp.ndarray:
    """(B, 32) payload -> (B, 4, 240) SSB tile (PSS+SSS+PBCH+DMRS)."""
    B = payload.shape[0]
    grid = jnp.zeros((B, 4, N_SSB_SC), jnp.complex64)
    pss = jnp.asarray(refsig.pss_sequence(cfg.n_id % 3), dtype=jnp.complex64)
    sss = jnp.asarray(refsig.sss_sequence(cfg.n_id // 3, cfg.n_id % 3), dtype=jnp.complex64)
    grid = grid.at[:, 0, 56:183].set(pss)
    grid = grid.at[:, 2, 56:183].set(sss)
    scr = pbch_encode(cfg, payload)
    syms = modulate(scr, 2)                          # (B, 432) QPSK
    dpos = _data_positions(cfg)
    grid = grid.at[:, jnp.asarray(dpos[:, 0]), jnp.asarray(dpos[:, 1])].set(syms)
    dmrs = pbch_dmrs(cfg)
    mpos = _dmrs_positions(cfg)
    grid = grid.at[:, jnp.asarray(mpos[:, 0]), jnp.asarray(mpos[:, 1])].set(dmrs)
    return grid


def ssb_receive(cfg: PbchConfig, rx_tile: jnp.ndarray, list_size: int = 8):
    """(B, n_rx, 4, 240) received SSB tile -> decoded payload + CRC flag.

    DMRS LS estimation + comb-4 nearest interpolation + MRC + QPSK LLR +
    polar SCL decode.
    """
    mpos = _dmrs_positions(cfg)
    dpos = _data_positions(cfg)
    dmrs = pbch_dmrs(cfg)
    yp = rx_tile[:, :, jnp.asarray(mpos[:, 0]), jnp.asarray(mpos[:, 1])]
    hp = ls_estimate(yp, dmrs)                       # (B, R, 144)
    # block-fading assumption over the 4-symbol SSB: average the LS
    # estimates over the symbols sharing each comb-4 SC position (syms
    # 1/3 carry all 60, sym 2 the outer 24), then smooth in frequency —
    # the combined time+filt16a averaging of nr_dl_channel_estimation.c
    from ..phy.channel_estimation import freq_average
    pos_of = {}
    for i, (s, k) in enumerate(np.asarray(mpos)):
        pos_of.setdefault(int(k), []).append(i)
    scs = sorted(pos_of)
    sums = jnp.stack(
        [jnp.mean(hp[..., jnp.asarray(pos_of[k])], axis=-1) for k in scs], axis=-1)
    h_sc = freq_average(sums, window=16)             # (B, R, 60)
    # map each data RE to its nearest comb-4 SC estimate
    sc_arr = np.array(scs)
    h_map = np.abs(dpos[:, 1][None, :] - sc_arr[:, None]).argmin(axis=0)
    h_data = h_sc[..., jnp.asarray(h_map)]           # (B, R, 432)
    yd = rx_tile[:, :, jnp.asarray(dpos[:, 0]), jnp.asarray(dpos[:, 1])]
    x = jnp.sum(jnp.conj(h_data) * yd, axis=1)       # MRC over rx ants
    mag = jnp.sum(jnp.abs(h_data) ** 2, axis=1)
    llr_e = llr_compute(x, mag, 2)
    return pbch_decode(cfg, llr_e, list_size=list_size)


def _nearest_pilot_map(cfg: PbchConfig) -> np.ndarray:
    """For each PBCH data RE, index of the nearest DMRS RE (same symbol)."""
    mpos = _dmrs_positions(cfg)
    dpos = _data_positions(cfg)
    out = np.empty(len(dpos), dtype=np.int32)
    for i, (s, k) in enumerate(dpos):
        cand = np.nonzero(mpos[:, 0] == s)[0]
        j = cand[np.argmin(np.abs(mpos[cand, 1] - k))]
        out[i] = j
    return out
