"""UE/gNB measurements: RSRP / RSRQ / SNR / CQI (nr_ue_measurements.c analog).

Reference anchor: openair1/PHY/NR_UE_ESTIMATION/nr_ue_measurements.c.
All measurements are reductions over reference-signal REs.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# CQI table 2 (TS 38.214 Table 5.2.2.1-3, 256QAM): SNR thresholds (approx,
# link-level calibrated) -> CQI index; used for simple link adaptation.
_CQI_SNR_THRESH_DB = np.array(
    [-6.7, -4.7, -2.3, 0.2, 2.4, 4.3, 5.9, 8.1, 10.3, 11.7,
     14.1, 16.3, 18.7, 21.0, 22.7])


def rsrp(h_est: jnp.ndarray) -> jnp.ndarray:
    """Reference-signal received power from channel estimates at RS REs.

    h_est: (..., n_re) -> linear RSRP per leading dims.
    """
    return jnp.mean(jnp.abs(h_est) ** 2, axis=-1)


def rssi(grid: jnp.ndarray) -> jnp.ndarray:
    """Total received power over a grid (..., n_re)."""
    return jnp.mean(jnp.abs(grid) ** 2, axis=-1)


def rsrq(rsrp_lin: jnp.ndarray, rssi_lin: jnp.ndarray, n_rb: int) -> jnp.ndarray:
    """RSRQ = N * RSRP / RSSI (TS 38.215)."""
    return n_rb * rsrp_lin / jnp.maximum(rssi_lin, 1e-12)


def snr_db(rsrp_lin: jnp.ndarray, noise_var: jnp.ndarray) -> jnp.ndarray:
    return 10.0 * jnp.log10(jnp.maximum(rsrp_lin, 1e-12) /
                            jnp.maximum(noise_var, 1e-12))


def cqi_from_snr(snr: jnp.ndarray) -> jnp.ndarray:
    """Map SNR (dB) to CQI 1..15 by threshold table."""
    t = jnp.asarray(_CQI_SNR_THRESH_DB)
    return jnp.sum(snr[..., None] >= t, axis=-1).astype(jnp.int32)
