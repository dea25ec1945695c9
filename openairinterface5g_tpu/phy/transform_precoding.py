"""Transform precoding (SC-FDMA / DFT-s-OFDM), TS 38.211 §6.3.1.4 (P6).

The reference implements nr_dft over all Msc = 12*n_prb sizes with
fixed-point radix kernels (openair1/PHY/MODULATION/nr_modulation.c:335)
and the gNB-side inverse in nr_ulsch_demodulation.c:16 (nr_idft), with
per-RE |H|^2 division in nr_freq_equalization.c:37.  Here both are
batched XLA FFTs (any Msc with factors 2/3/5 — XLA handles arbitrary N)
plus a harmonic-mean effective gain for the LLR stage.
"""
from __future__ import annotations

import jax.numpy as jnp


def dft_spread(symbols: jnp.ndarray, msc: int) -> jnp.ndarray:
    """(..., n_sym*msc) modulated symbols -> DFT-spread freq symbols."""
    lead = symbols.shape[:-1]
    x = symbols.reshape(*lead, -1, msc)
    y = jnp.fft.fft(x, axis=-1) / jnp.sqrt(jnp.float32(msc))
    return y.reshape(*lead, -1).astype(jnp.complex64)


def idft_despread(x_mf: jnp.ndarray, mag: jnp.ndarray, msc: int):
    """Inverse at gNB RX on matched-filter outputs.

    x_mf: (..., n_sym*msc) compensated symbols (|H|^2-weighted),
    mag: same-shaped |H|^2.  Per-RE ZF division (nr_freq_equalization
    analog) -> IDFT -> harmonic-mean effective gain for LLRs.
    Returns (d (..., n_sym*msc) compensated time-domain symbols, mag_eff).
    """
    lead = x_mf.shape[:-1]
    xf = (x_mf / jnp.maximum(mag, 1e-12)).reshape(*lead, -1, msc)
    d = jnp.fft.ifft(xf, axis=-1) * jnp.sqrt(jnp.float32(msc))
    # post-ZF noise per output sample ~ mean(1/mag); effective SNR gain is
    # the harmonic mean of mag across the spread block
    hmean = msc / jnp.sum(1.0 / jnp.maximum(mag.reshape(*lead, -1, msc), 1e-12), axis=-1)
    mag_eff = jnp.broadcast_to(hmean[..., None], d.shape).reshape(*lead, -1)
    d = d.reshape(*lead, -1) * mag_eff
    return d.astype(jnp.complex64), mag_eff.astype(jnp.float32)
