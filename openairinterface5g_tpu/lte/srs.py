"""LTE SRS (TS 36.211 §5.5.3): wideband sounding in the last subframe
symbol, comb-2, Zadoff-Chu base with per-UE cyclic shift.

Reference: openair1/PHY/LTE_TRANSPORT/srs_modulation.c + the eNB
channel-sounding estimate.  Shares the low-PAPR sequence generator with
NR; the RX returns the per-subcarrier channel estimate and a wideband
SNR figure the MAC's link adaptation consumes (l2/mac.py CQI path).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..phy.refsig import low_papr_sequence


@dataclasses.dataclass(frozen=True)
class LteSrsConfig:
    n_rb: int = 25
    srs_rb: int = 24               # sounded bandwidth (multiple of 4)
    rb_start: int = 0
    cell_id: int = 0
    cyclic_shift: int = 0          # n_srs_cs (0..7)
    comb: int = 0                  # transmissionComb kTC=2
    n_rx: int = 1

    @property
    def m_sc(self) -> int:
        return self.srs_rb * 12 // 2        # comb-2: every other SC

    def sequence_np(self) -> np.ndarray:
        r = low_papr_sequence(self.cell_id % 30, 0, self.m_sc)
        alpha = 2 * np.pi * self.cyclic_shift / 8
        return (r * np.exp(1j * alpha * np.arange(self.m_sc))).astype(np.complex64)

    def sc_indices(self) -> np.ndarray:
        return 12 * self.rb_start + 2 * np.arange(self.m_sc) + self.comb


def srs_tx(cfg: LteSrsConfig, batch: int = 1) -> jnp.ndarray:
    """-> (B, n_sc) REs of the SRS symbol (symbol 13 of the subframe)."""
    grid = jnp.zeros((batch, 12 * cfg.n_rb), jnp.complex64)
    return grid.at[:, jnp.asarray(cfg.sc_indices())].set(
        jnp.asarray(cfg.sequence_np()))


def srs_rx(cfg: LteSrsConfig, y_sym: jnp.ndarray):
    """(B, n_rx, n_sc) received SRS symbol -> dict(h (B,R,m_sc),
    snr_db (B,), noise_var (B,)).

    LS at the comb, noise from adjacent-estimate differences (the same
    estimator the PUSCH DMRS path uses)."""
    yp = y_sym[..., jnp.asarray(cfg.sc_indices())]
    h = yp * jnp.conj(jnp.asarray(cfg.sequence_np()))
    d = h[..., 1:] - h[..., :-1]
    nvar = jnp.mean(jnp.abs(d) ** 2, axis=(-2, -1)) / 2
    p = jnp.mean(jnp.abs(h) ** 2, axis=(-2, -1))
    snr = 10.0 * jnp.log10(jnp.maximum(p - nvar, 1e-12)
                           / jnp.maximum(nvar, 1e-12))
    return {"h": h, "snr_db": snr, "noise_var": nvar}
