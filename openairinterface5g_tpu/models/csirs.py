"""CSI-RS transmission + UE measurement/CQI reporting (P8/P28 + UE meas).

Reference anchors: gNB TX openair1/PHY/NR_TRANSPORT/nr_csi_rs.c, UE
measurement nr_ue_measurements.c / CSI derivation in NR_UE_MAC.  Row-1
style single-port CSI-RS: one RE per PRB per configured symbol, gold-
seeded QPSK; the UE LS-estimates the channel at CSI-RS REs, derives
RSRP / noise / SNR and maps to a CQI index for link adaptation.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..phy import refsig
from ..phy.channel_estimation import ls_estimate
from ..phy.measurements import cqi_from_snr, rsrp, snr_db


@dataclasses.dataclass(frozen=True)
class CsirsConfig:
    n_prb: int = 48
    symbol: int = 6
    re_offset: int = 0       # subcarrier within each PRB
    n_id: int = 0
    slot: int = 0
    density: int = 1         # REs per PRB


def csirs_sc_indices(cfg: CsirsConfig) -> np.ndarray:
    return (np.arange(cfg.n_prb) * 12 + cfg.re_offset).astype(np.int32)


def csirs_tx_grid(cfg: CsirsConfig, batch: int, n_sc: int) -> jnp.ndarray:
    """(B, n_sc) CSI-RS REs for the configured symbol (zeros elsewhere)."""
    cinit = refsig.csirs_cinit(cfg.slot, cfg.symbol, cfg.n_id)
    seq = refsig.csirs_sequence(cinit, cfg.n_prb)
    sc = csirs_sc_indices(cfg)
    row = jnp.zeros((n_sc,), jnp.complex64).at[jnp.asarray(sc)].set(seq)
    return jnp.broadcast_to(row, (batch, n_sc))


def csi_measure(cfg: CsirsConfig, rx_symbol: jnp.ndarray) -> dict:
    """UE measurement from the received CSI-RS symbol.

    rx_symbol: (B, n_rx, n_sc).  Returns rsrp (linear), noise_var, snr_db,
    cqi, wideband channel estimates h (B, n_rx, n_prb).
    """
    cinit = refsig.csirs_cinit(cfg.slot, cfg.symbol, cfg.n_id)
    seq = refsig.csirs_sequence(cinit, cfg.n_prb)
    sc = csirs_sc_indices(cfg)
    y = rx_symbol[..., jnp.asarray(sc)]
    h = ls_estimate(y, seq)                       # (B, R, n_prb)
    p = rsrp(h).mean(axis=-1)                     # avg over rx ants
    d = h[..., 1:] - h[..., :-1]
    nvar = jnp.mean(jnp.abs(d) ** 2, axis=(-1, -2)) / 2
    snr = snr_db(p, nvar)
    return {"h": h, "rsrp": p, "noise_var": nvar, "snr_db": snr,
            "cqi": cqi_from_snr(snr)}
