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
    density: int = 1         # REs per PRB (per CDM group)
    n_ports: int = 1         # 1 (row 1) or 2 (row 3: CDM2 freq-OCC over
                             # an adjacent RE pair, TS 38.211 Table
                             # 7.4.1.5.3-1)


def csirs_sc_indices(cfg: CsirsConfig) -> np.ndarray:
    """Occupied subcarriers (both REs of the CDM2 pair for 2 ports)."""
    base = np.arange(cfg.n_prb) * 12 + cfg.re_offset
    if cfg.n_ports == 1:
        return base.astype(np.int32)
    return np.sort(np.concatenate([base, base + 1])).astype(np.int32)


def csirs_tx_grid(cfg: CsirsConfig, batch: int, n_sc: int) -> jnp.ndarray:
    """CSI-RS REs for the configured symbol (zeros elsewhere).

    Returns (B, n_sc) for 1 port, (B, n_ports, n_sc) for 2 ports —
    port p applies the freq-domain OCC w_f = [+1, (+1|-1)] over the
    adjacent RE pair (CDM group, 38.211 §7.4.1.5.3)."""
    cinit = refsig.csirs_cinit(cfg.slot, cfg.symbol, cfg.n_id)
    seq = refsig.csirs_sequence(cinit, cfg.n_prb)
    base = jnp.asarray((np.arange(cfg.n_prb) * 12 + cfg.re_offset
                        ).astype(np.int32))
    if cfg.n_ports == 1:
        row = jnp.zeros((n_sc,), jnp.complex64).at[base].set(seq)
        return jnp.broadcast_to(row, (batch, n_sc))
    rows = []
    for p in range(2):
        wf1 = 1.0 if p == 0 else -1.0
        row = jnp.zeros((n_sc,), jnp.complex64)
        row = row.at[base].set(seq)
        row = row.at[base + 1].set(wf1 * seq)
        rows.append(row)
    return jnp.broadcast_to(jnp.stack(rows), (batch, 2, n_sc))


# 2-TX 1-layer PMI codebook, TS 38.214 Table 5.2.2.2.1-1 (W = [1, phi]/sqrt 2)
PMI_CODEBOOK_2TX = np.stack([
    np.array([1.0, 1.0]), np.array([1.0, -1.0]),
    np.array([1.0, 1.0j]), np.array([1.0, -1.0j]),
]).astype(np.complex64) / np.sqrt(2)


def select_pmi(h_ports: jnp.ndarray) -> tuple:
    """PMI selection from per-port channel estimates.

    h_ports: (B, n_rx, 2, n_prb).  Returns (pmi (B,) int32, gain (B, 4)
    post-precoding power per codebook entry) — argmax of
    sum_prb sum_rx |sum_p h[r,p] W[i,p]|^2 (the CSI derivation the
    reference does in nr_csi_rs UE processing / gNB_scheduler_uci.c
    consumption)."""
    W = jnp.asarray(PMI_CODEBOOK_2TX)                  # (4, 2)
    eff = jnp.einsum("brpk,ip->birk", h_ports, W)      # (B, 4, R, n_prb)
    gain = jnp.sum(jnp.abs(eff) ** 2, axis=(2, 3))     # (B, 4)
    return jnp.argmax(gain, axis=-1).astype(jnp.int32), gain


def csi_measure_2port(cfg: CsirsConfig, rx_symbol: jnp.ndarray) -> dict:
    """2-port CSI measurement -> per-port channel, PMI, post-PMI CQI.

    rx_symbol: (B, n_rx, n_sc).  CDM2 separation: h_p0 = (y0 + y1*s1')/2,
    h_p1 = (y0 - y1*s1')/2 over the adjacent RE pair."""
    assert cfg.n_ports == 2
    cinit = refsig.csirs_cinit(cfg.slot, cfg.symbol, cfg.n_id)
    seq = refsig.csirs_sequence(cinit, cfg.n_prb)
    base = np.arange(cfg.n_prb) * 12 + cfg.re_offset
    y0 = rx_symbol[..., jnp.asarray(base)] * jnp.conj(seq)
    y1 = rx_symbol[..., jnp.asarray(base + 1)] * jnp.conj(seq)
    h = jnp.stack([0.5 * (y0 + y1), 0.5 * (y0 - y1)], axis=2)  # (B,R,2,K)
    pmi, gain = select_pmi(h)
    d = h[..., 1:] - h[..., :-1]
    nvar = jnp.mean(jnp.abs(d) ** 2, axis=(-1, -2, -3))
    best = jnp.max(gain, axis=-1) / (h.shape[1] * cfg.n_prb)
    snr = snr_db(best, nvar)
    return {"h": h, "pmi": pmi, "gain": gain, "noise_var": nvar,
            "snr_db": snr, "cqi": cqi_from_snr(snr)}


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


def csirs_rm_pattern(cfg: CsirsConfig, csirs_prb_start: int,
                     pdsch) -> tuple:
    """((symbol, sc), ...) of CSI-RS REs inside a PDSCH allocation, sc
    relative to the allocation start — feed to PuschConfig.rm_res so the
    PDSCH rate-matches around the CSI-RS (gNB_scheduler_dlsch.c:62
    sched_csirs + the PDU rateMatchPattern analog)."""
    sc_abs = csirs_sc_indices(cfg) + 12 * csirs_prb_start
    a0 = pdsch.sc0
    a1 = a0 + 12 * pdsch.n_prb
    return tuple((int(cfg.symbol), int(m - a0))
                 for m in sc_abs if a0 <= m < a1)
