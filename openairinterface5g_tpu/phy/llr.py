"""Max-log LLR computation from compensated symbols (P24 analog).

Matches the structure of openair1/PHY/NR_TRANSPORT/
nr_ulsch_llr_computation.c (nr_ulsch_qpsk_llr:45 ... 256qam:210): inputs
are matched-filter outputs x = |H|^2 * s + noise and the channel
magnitude A = |H|^2 per RE, so thresholds are A-scaled constellation
boundaries and no divisions appear.  LLR > 0 <=> bit = 0.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def llrs(x: jnp.ndarray, mag: jnp.ndarray, qm: int) -> jnp.ndarray:
    """(..., n_re) compensated symbols + (..., n_re) magnitudes -> (..., n_re*qm).

    Bit order per symbol follows the constellation convention in
    modulation.py (b0 = MSB = sign of I, b1 = sign of Q, ...).
    """
    re, im = jnp.real(x), jnp.imag(x)
    if qm == 1:  # BPSK on (1+j)/sqrt2 axis: project
        l0 = (re + im) * np.float32(1 / np.sqrt(2))
        out = l0[..., None]
    elif qm == 2:
        out = jnp.stack([re, im], axis=-1) * np.float32(1 / np.sqrt(2))
    elif qm == 4:
        s = np.float32(1 / np.sqrt(10))
        t = 2 * s * mag
        out = jnp.stack([re, im, t - jnp.abs(re), t - jnp.abs(im)], axis=-1)
    elif qm == 6:
        s = np.float32(1 / np.sqrt(42))
        t4, t2 = 4 * s * mag, 2 * s * mag
        b2 = t4 - jnp.abs(re)
        b3 = t4 - jnp.abs(im)
        b4 = t2 - jnp.abs(b2)
        b5 = t2 - jnp.abs(b3)
        out = jnp.stack([re, im, b2, b3, b4, b5], axis=-1)
    elif qm == 8:
        s = np.float32(1 / np.sqrt(170))
        t8, t4, t2 = 8 * s * mag, 4 * s * mag, 2 * s * mag
        b2 = t8 - jnp.abs(re)
        b3 = t8 - jnp.abs(im)
        b4 = t4 - jnp.abs(b2)
        b5 = t4 - jnp.abs(b3)
        b6 = t2 - jnp.abs(b4)
        b7 = t2 - jnp.abs(b5)
        out = jnp.stack([re, im, b2, b3, b4, b5, b6, b7], axis=-1)
    else:
        raise ValueError(f"qm={qm}")
    return out.reshape(*x.shape[:-1], x.shape[-1] * qm).astype(jnp.float32)


def quantize(llr: jnp.ndarray, bits: int = 8, target_rms: float = 16.0) -> jnp.ndarray:
    """Quantize LLRs to `bits`-bit integer range (8-bit reference parity).

    The reference carries 8-bit LLRs end-to-end with AGC-style shift
    management (log2_maxh / nr_ulsch_scale_channel); here float LLRs are
    scaled so their RMS sits at `target_rms` of the [-2^(b-1)+1, 2^(b-1)-1]
    range, rounded, and saturated — decoding then sees exactly the
    information an int8 pipeline would.
    """
    lim = float(2 ** (bits - 1) - 1)
    rms = jnp.sqrt(jnp.mean(llr * llr, axis=-1, keepdims=True) + 1e-12)
    scaled = llr * (target_rms / rms)
    return jnp.clip(jnp.round(scaled), -lim, lim)
