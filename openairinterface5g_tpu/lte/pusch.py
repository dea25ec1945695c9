"""LTE PUSCH / ULSCH chain (TS 36.211 §5.3-5.5, 36.212 §5.2.2).

Reference: openair1/PHY/LTE_TRANSPORT/ulsch_coding.c, ulsch_modulation.c
and the eNB side ulsch_demodulation.c / ulsch_decoding.c.  SC-FDMA
(DFT-spread OFDM) single layer: the DFT spread reuses
phy/transform_precoding.py; DMRS is the Zadoff-Chu low-PAPR sequence on
symbol 3 of each slot (36.211 §5.5.2.1.1), estimated per slot and MRC-
combined; the turbo coding path is shared with lte/pdsch.py.
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ..coding.crc import crc_attach, crc_ok, CRC_POLYS
from ..phy import llr as llr_mod
from ..phy import modulation as mod
from ..phy.refsig import low_papr_sequence
from ..phy.scrambling import gold_sequence_np
from ..phy.transform_precoding import dft_spread, idft_despread
from . import rate_matching as rm
from . import segmentation as seg
from .params import LteFrameParams, make_lte_frame_params, map_to_grid, \
    extract_from_grid, ofdm_modulate, ofdm_demodulate
from .pdsch import lte_mcs_qm, _interp_matrix  # shared helpers


@dataclasses.dataclass(frozen=True)
class LtePuschConfig:
    n_rb: int = 25
    n_prb: int = 25
    prb_start: int = 0
    mcs: int = 16
    tbs_override: int | None = None
    cell_id: int = 0
    rnti: int = 0x1234
    subframe: int = 1
    n_rx: int = 1

    @property
    def fp(self) -> LteFrameParams:
        return make_lte_frame_params(self.n_rb)

    @property
    def qm(self) -> int:
        return min(lte_mcs_qm(self.mcs), 6)

    @property
    def dmrs_symbols(self) -> tuple:
        """Symbol 3 of each slot (normal CP)."""
        sps = self.fp.symbols_per_slot
        return (3, sps + 3)

    @property
    def data_symbols(self) -> tuple:
        return tuple(s for s in range(self.fp.symbols_per_subframe)
                     if s not in self.dmrs_symbols)

    @property
    def msc(self) -> int:
        return 12 * self.n_prb

    @property
    def n_data_re(self) -> int:
        return len(self.data_symbols) * self.msc

    @property
    def G(self) -> int:
        return self.n_data_re * self.qm

    @property
    def tbs(self) -> int:
        if self.tbs_override is not None:
            return self.tbs_override
        from ..transport import mcs_to_qm_rate
        rate = mcs_to_qm_rate(min(self.mcs, 27), 1)[1]
        a = int(self.G * rate) - 24
        return max((a // 8) * 8, 16)

    def seg(self) -> seg.LteSegParams:
        return seg.segment_params(self.tbs + 24)

    def scrambling_cinit(self) -> int:
        """36.211 §5.3.1 (q = 0)."""
        return (self.rnti << 14) + (self.subframe << 9) + self.cell_id

    def dmrs_pilot_np(self, slot_idx: int) -> np.ndarray:
        """Low-PAPR r_{u,v} for the slot's DMRS (group hopping off;
        u = cell_id mod 30 as the reference's default)."""
        return low_papr_sequence(self.cell_id % 30, 0, self.msc)


def ulsch_encode(cfg: LtePuschConfig, tb_bits: jnp.ndarray, rv: int = 0):
    from .pdsch import LtePdschConfig, dlsch_encode
    proxy = _coding_proxy(cfg)
    return dlsch_encode(proxy, tb_bits, rv)


def ulsch_decode(cfg: LtePuschConfig, llr_cw: jnp.ndarray, rv: int = 0,
                 n_iters: int = 6):
    from .pdsch import dlsch_decode
    return dlsch_decode(_coding_proxy(cfg), llr_cw, rv, n_iters=n_iters)


@functools.lru_cache(maxsize=32)
def _coding_proxy(cfg: LtePuschConfig):
    """DLSCH/ULSCH share 36.212 §5.1 coding; reuse the PDSCH module with
    a config exposing the same (tbs, G, qm)."""
    from .pdsch import LtePdschConfig

    @dataclasses.dataclass(frozen=True)
    class _Proxy(LtePdschConfig):
        g_override: int = 0

        @property
        def G(self):  # noqa: N802
            return self.g_override

    return _Proxy(n_rb=cfg.n_rb, n_prb=cfg.n_prb, mcs=cfg.mcs,
                  tbs_override=cfg.tbs, g_override=cfg.G)


def pusch_tx(cfg: LtePuschConfig, tb_bits: jnp.ndarray, rv: int = 0):
    """(B, TBS) -> ((B, 1, samples) SC-FDMA subframe, scrambled bits)."""
    cw = ulsch_encode(cfg, tb_bits, rv)
    c = jnp.asarray(gold_sequence_np(cfg.scrambling_cinit(), cfg.G).astype(np.int8))
    scrambled = jnp.bitwise_xor(cw.astype(jnp.int8), c)
    syms = mod.modulate(scrambled, cfg.qm)               # (B, n_data_re)
    spread = dft_spread(syms, cfg.msc)
    fp = cfg.fp
    B = tb_bits.shape[0]
    a0 = 12 * cfg.prb_start
    grid_re = jnp.zeros((B, 1, fp.symbols_per_subframe, fp.n_sc), jnp.complex64)
    for i, s in enumerate(cfg.data_symbols):
        grid_re = grid_re.at[:, 0, s, a0: a0 + cfg.msc].set(
            spread[:, i * cfg.msc: (i + 1) * cfg.msc])
    for si, s in enumerate(cfg.dmrs_symbols):
        pil = jnp.asarray(cfg.dmrs_pilot_np(si))
        grid_re = grid_re.at[:, 0, s, a0: a0 + cfg.msc].set(pil)
    grid = map_to_grid(fp, grid_re)
    return ofdm_modulate(fp, grid), scrambled


def pusch_rx(cfg: LtePuschConfig, rx_samples: jnp.ndarray, rv: int = 0,
             n_iters: int = 6, acc_streams: list | None = None):
    """(B, n_rx, samples) -> decoded TB dict (HARQ combining as pdsch_rx)."""
    fp = cfg.fp
    grid = ofdm_demodulate(fp, rx_samples)
    re_grid = extract_from_grid(fp, grid)                # (B, R, 14, n_sc)
    a0 = 12 * cfg.prb_start
    # per-slot LS at DMRS, averaged (block fading), light freq smoothing
    hs = []
    for si, s in enumerate(cfg.dmrs_symbols):
        pil = jnp.asarray(cfg.dmrs_pilot_np(si))
        yp = re_grid[:, :, s, a0: a0 + cfg.msc]
        hs.append(yp * jnp.conj(pil))
    h = sum(hs) / len(hs)                                # (B, R, msc)
    d = hs[0] - hs[1]
    nvar = jnp.mean(jnp.abs(d) ** 2, axis=(-2, -1)) / 2
    # MRC + equalize data symbols, then IDFT despread per symbol
    y = re_grid[:, :, jnp.asarray(cfg.data_symbols), a0: a0 + cfg.msc]
    x = jnp.sum(jnp.conj(h)[:, :, None, :] * y, axis=1)  # (B, S, msc)
    mag = jnp.sum(jnp.abs(h) ** 2, axis=1)[:, None, :] * jnp.ones_like(x.real)
    B, S, M = x.shape
    xd, md = idft_despread(x.reshape(B, S * M), mag.reshape(B, S * M), M)
    lls = llr_mod.llrs(xd[:, None], md[:, None], cfg.qm)[:, 0]
    c = jnp.asarray(gold_sequence_np(cfg.scrambling_cinit(), cfg.G).astype(np.float32))
    lls = lls * (1.0 - 2.0 * c)
    from .pdsch import dlsch_deratematch, dlsch_decode_streams
    proxy = _coding_proxy(cfg)
    streams = dlsch_deratematch(proxy, lls, rv)
    if acc_streams is not None:
        streams = [a + s for a, s in zip(acc_streams, streams)]
    out = dlsch_decode_streams(proxy, streams, n_iters=n_iters)
    out["llrs"] = lls
    out["streams"] = streams
    return out
