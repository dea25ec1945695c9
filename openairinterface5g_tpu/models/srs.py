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

    Returns dict: h (B, n_rx, n_ports, m) per-port channel (m = comb SCs
    for 1 port, comb SCs / n_ports group centers for >1), noise_var (B,).

    Port separation: ports differ by a cyclic shift of 8/n_ports, so the
    other port's contribution rotates through a full circle every
    n_ports comb subcarriers — averaging each group of n_ports adjacent
    LS values nulls it exactly (the delay-domain windowing of
    nr_srs_channel_estimation, nr_ul_channel_estimation.c:614, done as a
    group mean instead of an IFFT window).
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
    P = cfg.n_ports
    if P > 1:
        m = h.shape[-1] - (h.shape[-1] % P)
        hg = h[..., :m].reshape(*h.shape[:-1], m // P, P)
        h = jnp.mean(hg, axis=-1)                     # (B, R, P, m/P)
    d = h[..., 1:] - h[..., :-1]
    # group averaging divides the noise var by P; scale the residual back
    nvar = jnp.mean(jnp.abs(d) ** 2, axis=(-1, -2, -3)) / 2 * P
    return {"h": h, "noise_var": nvar}


def srs_report(cfg: SrsConfig, rx: jnp.ndarray, n_subbands: int = 4) -> dict:
    """SRS consumer: turn the sounded channel into UL link-adaptation
    inputs (the srs_rx.c -> gNB scheduler feed the round-4 build lacked).

    Returns dict with:
      wideband_snr_db (B,), ul_cqi (B,) — drives the UL MCS choice
        (MacScheduler.on_srs)
      subband_snr_db (B, n_subbands) — frequency-selective scheduling
      pmi (B,) — 2-port UL codebook index (TS 38.214 Table 6.3.1.5-1
        class, same 2TX codebook as models.csirs) when n_ports == 2
    Reference anchors: srs_rx.c (channel matrix + noise power out),
    gNB_scheduler_ulsch.c link adaptation consumption."""
    from ..phy.measurements import cqi_from_snr

    out = srs_rx(cfg, rx)
    h, nvar = out["h"], out["noise_var"]             # (B, R, P, m), (B,)
    p_sig = jnp.mean(jnp.abs(h) ** 2, axis=(1, 2, 3))
    wb_snr = 10.0 * jnp.log10(jnp.maximum(p_sig, 1e-12)
                              / jnp.maximum(nvar, 1e-12))
    m = h.shape[-1] - (h.shape[-1] % n_subbands)
    hb = h[..., :m].reshape(*h.shape[:-1], n_subbands, m // n_subbands)
    p_sb = jnp.mean(jnp.abs(hb) ** 2, axis=(1, 2, 4))
    sb_snr = 10.0 * jnp.log10(jnp.maximum(p_sb, 1e-12)
                              / jnp.maximum(nvar[:, None], 1e-12))
    rep = {"h": h, "noise_var": nvar, "wideband_snr_db": wb_snr,
           "subband_snr_db": sb_snr, "ul_cqi": cqi_from_snr(wb_snr)}
    if cfg.n_ports == 2:
        from .csirs import select_pmi
        pmi, gain = select_pmi(h)
        rep["pmi"] = pmi
        rep["pmi_gain"] = gain
    return rep
