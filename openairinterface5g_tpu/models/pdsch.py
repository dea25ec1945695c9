"""PDSCH end-to-end chain: gNB TX (P18) -> UE RX (P30/P31).

Reference anchors: TX nr_generate_pdsch (openair1/PHY/NR_TRANSPORT/
nr_dlsch.c:56) with nr_dlsch_encoding (nr_dlsch_coding.c:262); RX
nr_rx_pdsch (openair1/PHY/NR_UE_TRANSPORT/nr_dlsch_demodulation.c:241)
with MRC (nr_dlsch_detection_mrc:1303) / ZF (nr_zero_forcing_rx:1726)
and nr_dlsch_decoding.

The DL chain is block-for-block the mirror of the UL chain (same codec,
scrambler seed formula, DMRS type 1, QAM tables; the MIMO receiver runs
at the UE instead of the gNB), so the implementation shares the batched
tensor chain in models/pusch.py; this module pins down the DL-specific
configuration (PDSCH scrambling q, UE-side ZF receiver option).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .pusch import (PuschConfig, pusch_channel_estimate,
                    pusch_decode_codeword, pusch_equalize, pusch_llrs,
                    pusch_rx, pusch_tx, pusch_tx_grid)


@dataclasses.dataclass(frozen=True)
class PdschConfig(PuschConfig):
    """PDSCH configuration; dmrs position 2 (type A), UE receiver = MRC/MMSE.

    n_layers = transmission layers (gNB antenna ports with identity
    precoding), n_rx = UE receive antennas.
    """
    mcs_table: int = 1


def pdsch_tx(cfg: PdschConfig, tb_bits, rv: int = 0):
    """gNB-side PDSCH TX: (batch, TBS) -> (batch, n_ant, samples)."""
    return pusch_tx(cfg, tb_bits, rv=rv)


def pdsch_rx(cfg: PdschConfig, rx_samples, rv: int = 0, n_iters: int = 20,
             harq_buffers=None):
    """UE-side PDSCH RX: channel est + MRC/MMSE + LLR + LDPC decode."""
    return pusch_rx(cfg, rx_samples, rv=rv, n_iters=n_iters,
                    harq_buffers=harq_buffers)


def pdsch_tx_precoded(cfg: PdschConfig, tb_bits, W, rv: int = 0):
    """PMI-precoded PDSCH TX: (batch, TBS) -> (batch, n_ant, samples).

    W: (n_ant, n_layers) codebook precoder (e.g. models.csirs
    PMI_CODEBOOK_2TX[pmi] for 2TX 1-layer).  DMRS is precoded with the
    data, so the UE estimates the effective channel H @ W and its
    standard receiver applies unchanged (nr_layer_precoder:662 +
    nr_feptx_prec analog)."""
    import jax.numpy as jnp
    from ..phy.ofdm import map_to_grid, ofdm_modulate

    grid_re, scr = pusch_tx_grid(cfg, tb_bits, rv)      # (B, L, S, n_sc)
    Wj = jnp.asarray(np.atleast_2d(np.asarray(W)), jnp.complex64)
    gw = jnp.einsum("al,blsk->bask", Wj, grid_re)       # (B, n_ant, S, n_sc)
    fp = cfg.fp
    return ofdm_modulate(fp, map_to_grid(fp, gw), cfg.slot), scr


# --------------------------------------------------------------------------
# Two-codeword PDSCH (5..8 layers, TS 38.211 §7.3.1.2 / 38.212 §7.2.1)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Pdsch2CwConfig:
    """2-codeword PDSCH: cw0 on the first ceil(L/2) layers, cw1 on the
    rest (layer-mapping Table 7.3.1.3-1); scrambling q = 0 / 1; DMRS
    type 1 double-symbol (maxLength=2) ports 0..L-1; joint MMSE/ZF over
    all L layers at the UE.  Reference anchor: the NrOfCodewords=2
    structures of nfapi_nr_interface_scf.h + nr_dlsch.c TX loop."""
    mu: int = 1
    n_prb: int = 24
    mcs0: int = 9
    mcs1: int = 9
    n_layers: int = 6            # 5..8
    n_rx: int = 8
    dmrs_symbols: tuple = (2, 3)  # consecutive pair(s), maxLength=2
    rnti: int = 0x1234
    n_id: int = 0
    slot: int = 0
    decoder_backend: str = "xla"

    @property
    def l0(self) -> int:
        return -(-self.n_layers // 2)

    def cw_cfgs(self) -> tuple[PdschConfig, PdschConfig]:
        assert 5 <= self.n_layers <= 8, "2-codeword PDSCH is 5..8 layers"
        common = dict(mu=self.mu, n_prb=self.n_prb, n_rx=self.n_rx,
                      dmrs_symbols=self.dmrs_symbols, dmrs_max_len=2,
                      rnti=self.rnti, n_id=self.n_id, slot=self.slot,
                      decoder_backend=self.decoder_backend)
        cw0 = PdschConfig(mcs=self.mcs0, n_layers=self.l0, dmrs_port0=0,
                          scrambling_q=0, **common)
        cw1 = PdschConfig(mcs=self.mcs1, n_layers=self.n_layers - self.l0,
                          dmrs_port0=self.l0, scrambling_q=1, **common)
        return cw0, cw1


def pdsch2cw_tx(cfg: Pdsch2CwConfig, tb0, tb1, rv: int = 0):
    """(B, TBS0), (B, TBS1) -> (B, n_layers, samples)."""
    from ..phy.ofdm import map_to_grid, ofdm_modulate
    import jax.numpy as jnp

    c0, c1 = cfg.cw_cfgs()
    g0, _ = pusch_tx_grid(c0, tb0, rv)        # (B, L0, sym, n_sc)
    g1, _ = pusch_tx_grid(c1, tb1, rv)
    grid_re = jnp.concatenate([g0, g1], axis=1)
    fp = c0.fp
    return ofdm_modulate(fp, map_to_grid(fp, grid_re), cfg.slot)


def pdsch2cw_rx(cfg: Pdsch2CwConfig, rx_samples, rv: int = 0,
                n_iters: int = 20):
    """(B, n_rx, samples) -> (out_cw0, out_cw1) decode dicts.

    One joint channel estimate over all L DMRS ports and one joint
    MMSE/ZF solve; per-codeword LLR/descramble (q=0/1) + LDPC decode."""
    from ..phy.ofdm import extract_from_grid, ofdm_demodulate

    c0, c1 = cfg.cw_cfgs()
    fp = c0.fp
    grid = ofdm_demodulate(fp, rx_samples, cfg.slot)
    re_grid = extract_from_grid(fp, grid)
    h_est, nvar = pusch_channel_estimate(c0, re_grid, n_ports=cfg.n_layers)
    x, mag = pusch_equalize(c0, re_grid, h_est, nvar)
    L0 = cfg.l0
    outs = []
    for c, sl in ((c0, slice(0, L0)), (c1, slice(L0, cfg.n_layers))):
        llr_cw = pusch_llrs(c, re_grid, x[:, sl], mag[:, sl], h_est)
        outs.append(pusch_decode_codeword(c, llr_cw, rv=rv, n_iters=n_iters))
    return tuple(outs)
