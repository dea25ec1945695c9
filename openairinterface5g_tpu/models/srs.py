"""SRS sounding: UE TX + gNB channel/noise estimation (P28 analog).

Reference anchors: openair1/PHY/NR_TRANSPORT/srs_rx.c +
nr_srs_channel_estimation (nr_ul_channel_estimation.c:614).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..phy import refsig
from ..phy.channel_estimation import ls_estimate


@dataclasses.dataclass(frozen=True)
class SrsConfig:
    n_prb: int = 48          # sounded bandwidth
    comb: int = 2
    comb_offset: int = 0
    u: int = 0               # sequence group
    cyclic_shift: int = 0
    n_ports: int = 1
    symbol: int = 13


def srs_tx(cfg: SrsConfig, batch: int) -> jnp.ndarray:
    """(B, n_ports, 12*n_prb) SRS REs (ports separated by cyclic shift)."""
    out = np.zeros((cfg.n_ports, 12 * cfg.n_prb), np.complex64)
    sc = refsig.srs_sc_indices(cfg.n_prb, cfg.comb, cfg.comb_offset)
    for p in range(cfg.n_ports):
        cs = (cfg.cyclic_shift + p * (8 // max(cfg.n_ports, 1))) % 8
        out[p, sc] = refsig.srs_sequence(cfg.n_prb, cfg.comb, cfg.u,
                                         cyclic_shift=cs)
    return jnp.broadcast_to(jnp.asarray(out), (batch, cfg.n_ports, 12 * cfg.n_prb))


def srs_rx(cfg: SrsConfig, rx: jnp.ndarray):
    """(B, n_rx, 12*n_prb) received SRS symbol -> channel + noise estimate.

    Returns dict: h (B, n_rx, n_ports, m_sc) per-port channel at the comb
    SCs, noise_var (B,) from comb residuals.
    """
    sc = refsig.srs_sc_indices(cfg.n_prb, cfg.comb, cfg.comb_offset)
    y = rx[..., jnp.asarray(sc)]                      # (B, R, m_sc)
    hs = []
    for p in range(cfg.n_ports):
        cs = (cfg.cyclic_shift + p * (8 // max(cfg.n_ports, 1))) % 8
        pil = jnp.asarray(refsig.srs_sequence(cfg.n_prb, cfg.comb, cfg.u,
                                              cyclic_shift=cs))
        hs.append(ls_estimate(y, pil))
    h = jnp.stack(hs, axis=2)                         # (B, R, P, m_sc)
    d = h[..., 1:] - h[..., :-1]
    nvar = jnp.mean(jnp.abs(d) ** 2, axis=(-1, -2, -3)) / 2
    return {"h": h, "noise_var": nvar}
