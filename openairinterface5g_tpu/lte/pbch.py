"""LTE PBCH (TS 36.211 §6.6, 36.212 §5.3.1).

Reference: openair1/PHY/LTE_TRANSPORT/pbch.c.  MIB (24 bits) + CRC16
masked by the antenna-count mask, tail-biting convolutional code
(coding/viterbi.py), rate-matched to 1920 bits (normal CP), scrambled
with the cell-ID Gold sequence over the 40 ms TTI, QPSK onto the
central 6 PRBs of symbols 7-10 of subframe 0 in four consecutive
frames.  RX soft-combines all four frames and tries the antenna-mask
hypotheses (the reference's pbch_detection loop).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..coding import viterbi
from ..phy import llr as llr_mod
from ..phy.scrambling import gold_sequence_np
from . import rate_matching as rm
from . import refsig
from .params import LteFrameParams, make_lte_frame_params

E_PBCH = 1920                    # normal CP, 4 frames x 480 bits
_ANT_MASK = {1: 0, 2: 0xFFFF, 4: 0x5555}  # 36.212 Table 5.3.1.1-1, MSB-first

_BW_TO_RB = (6, 15, 25, 50, 75, 100)


def mib_pack(n_rb: int, sfn: int, phich_duration: int = 0,
             phich_resource: int = 0) -> np.ndarray:
    """(24,) LTE MIB bits (TS 36.331 MasterInformationBlock): dl-Bandwidth(3),
    phich-duration(1), phich-resource(2), 8 MSBs of the 10-bit SFN, spare(10)."""
    bw = _BW_TO_RB.index(n_rb)
    v = (bw << 21) | (phich_duration << 20) | (phich_resource << 18) \
        | (((sfn >> 2) & 0xFF) << 10)
    return np.array([(v >> (23 - i)) & 1 for i in range(24)], np.int8)


def mib_unpack(bits: np.ndarray) -> dict:
    v = int(sum(int(b) << (23 - i) for i, b in enumerate(np.asarray(bits))))
    return {"n_rb": _BW_TO_RB[(v >> 21) & 7],
            "phich_duration": (v >> 20) & 1,
            "phich_resource": (v >> 18) & 3,
            "sfn_msb8": (v >> 10) & 0xFF}


@dataclasses.dataclass(frozen=True)
class LtePbchConfig:
    n_rb: int = 25
    cell_id: int = 0
    n_tx_ports: int = 1          # antenna-mask hypothesis (1/2/4)
    n_rx: int = 1

    @property
    def fp(self) -> LteFrameParams:
        return make_lte_frame_params(self.n_rb)

    def re_map(self) -> tuple:
        """(sym_ids, sc_ids) of the 240 PBCH REs of one frame (subframe 0,
        symbols 7-10, central 72 SCs, CRS REs of 4 ports reserved in
        symbols 7/8 regardless of actual port count)."""
        n_sc = self.fp.n_sc
        c0 = n_sc // 2 - 36
        vshift = self.cell_id % 6
        sym_ids, sc_ids = [], []
        for s in (7, 8, 9, 10):
            for k in range(72):
                # CRS of the (assumed) 4 ports occupies k_abs mod 3 ==
                # vshift mod 3 in symbols 7 (ports 0/1) and 8 (ports 2/3)
                if s in (7, 8) and (c0 + k) % 3 == vshift % 3:
                    continue
                sym_ids.append(s)
                sc_ids.append(c0 + k)
        return np.array(sym_ids), np.array(sc_ids)


def _crc16_masked(bits: jnp.ndarray, n_ports: int) -> jnp.ndarray:
    """(B, 24) MIB -> (B, 40) with antenna-masked CRC16 appended."""
    from ..coding.crc import crc_attach
    with_crc = crc_attach(bits.astype(jnp.int8), "16")
    mask = np.array([(_ANT_MASK[n_ports] >> (15 - i)) & 1 for i in range(16)],
                    np.int8)
    return with_crc.at[:, 24:].set(
        jnp.bitwise_xor(with_crc[:, 24:], jnp.asarray(mask)))


def pbch_encode(cfg: LtePbchConfig, mib_bits: jnp.ndarray) -> jnp.ndarray:
    """(B, 24) MIB -> (B, 1920) scrambled coded bits (one 40 ms TTI)."""
    a = _crc16_masked(mib_bits, cfg.n_tx_ports)          # (B, 40)
    d = viterbi.encode(a)                                # (B, 120) d0|d1|d2 interleaved
    # viterbi.encode emits per-step triples; regroup to stream order
    B = d.shape[0]
    d3 = d.reshape(B, 40, 3)
    d_flat = jnp.concatenate([d3[..., 0], d3[..., 1], d3[..., 2]], -1)
    e = rm.rate_match_tx(d_flat, rm.conv_rm_indices(40, E_PBCH))
    c = jnp.asarray(gold_sequence_np(cfg.cell_id, E_PBCH).astype(np.int8))
    return jnp.bitwise_xor(e.astype(jnp.int8), c)


def pbch_tx_grids(cfg: LtePbchConfig, mib_bits: jnp.ndarray) -> jnp.ndarray:
    """(B, 24) MIB -> (B, 4, 14, n_sc) subframe-0 RE grids for the four
    frames of the TTI (PBCH REs only; caller adds CRS/PSS/SSS)."""
    from ..phy import modulation as mod
    e = pbch_encode(cfg, mib_bits)
    syms = mod.modulate(e, 2)                            # (B, 960)
    B = syms.shape[0]
    fp = cfg.fp
    grids = jnp.zeros((B, 4, fp.symbols_per_subframe, fp.n_sc), jnp.complex64)
    sym_ids, sc_ids = cfg.re_map()
    n_re = len(sym_ids)                                  # 240
    for f in range(4):
        grids = grids.at[:, f, jnp.asarray(sym_ids), jnp.asarray(sc_ids)].set(
            syms[:, f * n_re: (f + 1) * n_re])
    return grids


def pbch_decode(cfg: LtePbchConfig, llr_e: jnp.ndarray):
    """(B, 1920) descrambled soft bits -> (mib (B, 24), ok (B,), n_ports).

    Tries each antenna-mask hypothesis; returns the first that passes
    CRC per batch element (reference pbch.c:pbch_unscrambling loop)."""
    d_flat = rm.rate_match_rx(llr_e, rm.conv_rm_indices(40, E_PBCH), 120)
    # stream order back to per-step triples for the Viterbi decoder
    B = d_flat.shape[0]
    d3 = jnp.stack([d_flat[:, :40], d_flat[:, 40:80], d_flat[:, 80:]], -1)
    bits = viterbi.decode(d3.reshape(B, 120))            # (B, 40)
    from ..coding.crc import crc_ok
    mib = bits[:, :24]
    best_ok = jnp.zeros((B,), bool)
    best_ports = jnp.zeros((B,), jnp.int32)
    for ports, maskv in _ANT_MASK.items():
        mask = np.array([(maskv >> (15 - i)) & 1 for i in range(16)], np.int8)
        unmasked = bits.at[:, 24:].set(
            jnp.bitwise_xor(bits[:, 24:], jnp.asarray(mask)))
        ok = crc_ok(unmasked, "16")
        best_ports = jnp.where(ok & ~best_ok, ports, best_ports)
        best_ok = best_ok | ok
    return mib, best_ok, best_ports


def pbch_rx_grids(cfg: LtePbchConfig, re_grids: jnp.ndarray,
                  h: jnp.ndarray, nvar=None):
    """(B, 4, R, 14, n_sc) received grids + (B, R, n_sc) channel ->
    decoded (mib, ok, n_ports) soft-combining the four frames."""
    sym_ids, sc_ids = cfg.re_map()
    y = re_grids[..., jnp.asarray(sym_ids), jnp.asarray(sc_ids)]  # (B,4,R,240)
    hh = h[:, None, :, jnp.asarray(sc_ids)]
    x = jnp.sum(jnp.conj(hh) * y, axis=2)               # (B, 4, 240)
    mag = jnp.sum(jnp.abs(hh) ** 2, axis=2) * jnp.ones_like(x.real)
    B = x.shape[0]
    lls = llr_mod.llrs(x.reshape(B, 1, -1), mag.reshape(B, 1, -1), 2)[:, 0]
    c = jnp.asarray(gold_sequence_np(cfg.cell_id, E_PBCH).astype(np.float32))
    lls = lls * (1.0 - 2.0 * c)
    return pbch_decode(cfg, lls)
