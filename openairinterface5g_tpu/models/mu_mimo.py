"""MU-MIMO: two UEs co-scheduled on the same PRBs via orthogonal
codebook precoders (the gNB_scheduler MU-MIMO pairing the round-4
critique flagged as missing).

TPU-native design: each UE's 1-layer PDSCH stream is built by the
shared pusch_tx_grid (own RNTI scrambling, own DMRS port so the UEs can
estimate both effective channels), precoded by its codebook column, and
the two 2-port grids are summed before one OFDM pass.  The receiving UE
runs the ordinary 2-port joint channel estimate + MMSE and keeps its
own layer — no new receiver machinery.

Pairing: PMI_CODEBOOK_2TX splits into two orthogonal pairs
({[1,1],[1,-1]} and {[1,j],[1,-j]}); mu_pair_select picks the
orthogonal (i, j) maximizing the weaker UE's post-precoding gain from
the two UEs' CSI reports (gNB_scheduler_dlsch MU pairing analog).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .csirs import PMI_CODEBOOK_2TX
from .pdsch import PdschConfig
from .pusch import (pusch_channel_estimate, pusch_decode_codeword,
                    pusch_llrs, pusch_tx_grid, _mmse_over_syms)
from ..phy.ofdm import extract_from_grid, map_to_grid, ofdm_modulate

# orthogonal codebook pairs: <W_i, W_j> = 0
_ORTHO_PAIRS = tuple((i, j) for i in range(4) for j in range(4)
                     if i != j and abs(np.vdot(PMI_CODEBOOK_2TX[i],
                                               PMI_CODEBOOK_2TX[j])) < 1e-6)


def mu_pair_select(gain1: np.ndarray, gain2: np.ndarray) -> tuple[int, int]:
    """Per-UE codebook gains (4,) -> orthogonal (pmi1, pmi2) maximizing
    the weaker UE's post-precoding power (max-min pairing)."""
    best, best_m = _ORTHO_PAIRS[0], -1.0
    for (i, j) in _ORTHO_PAIRS:
        m = min(float(gain1[i]), float(gain2[j]))
        if m > best_m:
            best, best_m = (i, j), m
    return best


def mu_cfgs(n_prb: int, rnti1: int, rnti2: int, n_rx: int = 2,
            mcs: int = 9, n_bwp_prb: int | None = None):
    """Per-UE PDSCH configs sharing the allocation: DMRS ports 0 / 1."""
    common = dict(mu=1, n_prb=n_prb, mcs=mcs, n_layers=1, n_rx=n_rx,
                  n_bwp_prb=n_bwp_prb, start_symbol=2, n_symbols=12,
                  dmrs_symbols=(2,))
    return (PdschConfig(rnti=rnti1, dmrs_port0=0, **common),
            PdschConfig(rnti=rnti2, dmrs_port0=1, **common))


def mu_mimo_tx(cfg1: PdschConfig, cfg2: PdschConfig, tb1, tb2,
               pmi1: int, pmi2: int):
    """Two 1-layer streams superposed on 2 TX ports -> (B, 2, samples)."""
    g1, _ = pusch_tx_grid(cfg1, tb1)           # (B, 1, S, n_sc)
    g2, _ = pusch_tx_grid(cfg2, tb2)
    W1 = jnp.asarray(PMI_CODEBOOK_2TX[pmi1])[:, None]
    W2 = jnp.asarray(PMI_CODEBOOK_2TX[pmi2])[:, None]
    gw = (jnp.einsum("al,blsk->bask", W1, g1)
          + jnp.einsum("al,blsk->bask", W2, g2))
    fp = cfg1.fp
    return ofdm_modulate(fp, map_to_grid(fp, gw), cfg1.slot)


def mu_mimo_rx(cfg_own: PdschConfig, own_port: int, rx_samples,
               n_iters: int = 10):
    """One UE's receive: joint 2-port effective-channel estimate (its
    own precoded stream on its DMRS port, the co-scheduled UE's on the
    other), MMSE interference suppression, keep own layer, decode."""
    from ..phy.ofdm import ofdm_demodulate
    fp = cfg_own.fp
    re_grid = extract_from_grid(fp, ofdm_demodulate(fp, rx_samples,
                                                    cfg_own.slot))
    base = PdschConfig(**{**cfg_own.__dict__, "dmrs_port0": 0,
                          "n_layers": 1})
    h, nvar = pusch_channel_estimate(base, re_grid, n_ports=2)
    m = 12 * cfg_own.n_prb
    a0 = cfg_own.sc0
    y = re_grid[:, :, jnp.asarray(list(cfg_own.data_symbols)),
                a0: a0 + m]
    x, mag = _mmse_over_syms(h, y, nvar)       # (B, 2, S, M)
    llr_cw = pusch_llrs(cfg_own, re_grid,
                        x[:, own_port: own_port + 1],
                        mag[:, own_port: own_port + 1], h)
    return pusch_decode_codeword(cfg_own, llr_cw, n_iters=n_iters)
