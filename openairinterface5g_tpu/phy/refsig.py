"""Reference signals: DMRS (TS 38.211 §6.4.1.1 / §7.4.1.1), PSS/SSS (§7.4.2).

The reference generates per-slot gold-seeded QPSK pilots into lookup
buffers (openair1/PHY/NR_REFSIG/nr_dmrs_rx.c, dmrs_nr.c, nr_gold.c).
Here pilots are produced directly as complex tensors from the vectorized
Gold generator; comb mapping is static index math.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .scrambling import gold_sequence

SQRT_HALF = np.float32(1 / np.sqrt(2))


def dmrs_cinit(slot: int, symbol: int, n_id: int, n_scid: int = 0, symbols_per_slot: int = 14):
    """TS 38.211 §6.4.1.1.1 / §7.4.1.1.1 DMRS scrambling init."""
    return (
        ((1 << 17) * (symbols_per_slot * slot + symbol + 1) * (2 * n_id + 1) + 2 * n_id + n_scid)
        % (1 << 31)
    )


def dmrs_sequence_np(cinit: int, n_pilots: int) -> np.ndarray:
    """Host-constant DMRS pilots for static cinit (see gold_sequence_np)."""
    from .scrambling import gold_sequence_np
    c = gold_sequence_np(int(cinit), 2 * n_pilots).astype(np.float32)
    re = (1.0 - 2.0 * c[0::2]) * SQRT_HALF
    im = (1.0 - 2.0 * c[1::2]) * SQRT_HALF
    return (re + 1j * im).astype(np.complex64)


def dmrs_sequence(cinit, n_pilots: int) -> jnp.ndarray:
    """r(n) = ((1-2c(2n)) + j(1-2c(2n+1)))/sqrt(2)  -> (n_pilots,) complex64."""
    c = gold_sequence(cinit, 2 * n_pilots).astype(jnp.float32)
    re = (1.0 - 2.0 * c[0::2]) * SQRT_HALF
    im = (1.0 - 2.0 * c[1::2]) * SQRT_HALF
    return (re + 1j * im).astype(jnp.complex64)


# --- DMRS type 1 comb mapping -----------------------------------------------
# Config type 1: comb-2; CDM group g in {0,1} occupies subcarriers
# 2k + g; ports within a group separated by freq OCC wf = (+1,+1)/(+1,-1).
# For rank 1-2 (ports 0,1): both in CDM group 0 (delta=0), wf distinguishes.

def dmrs_type1_sc_indices(n_prb: int, delta: int = 0) -> np.ndarray:
    """Occupied DMRS subcarrier indices within the allocation (6 per PRB)."""
    return (np.arange(6 * n_prb) * 2 + delta).astype(np.int32)


def dmrs_type1_port_weights(port: int) -> tuple[np.ndarray, int]:
    """(wf per pilot tone pattern, delta) for ports 0..3 (single-symbol).

    TS 38.211 Table 6.4.1.1.3-1: port 0: delta 0, wf (+1,+1); port 1:
    delta 0, wf (+1,-1); port 2: delta 1, wf (+1,+1); port 3: delta 1, (+1,-1).
    """
    delta = 0 if port in (0, 1) else 1
    alt = 1 if port in (0, 2) else -1
    return np.array([1.0, alt], dtype=np.float32), delta


def dmrs_type1_port_weights_double(port: int):
    """(wf (2,), wt (2,), delta) for ports 0..7, double-symbol type 1 DMRS
    (maxLength=2).  TS 38.211 Table 6.4.1.1.3-1: ports 0-3 as the
    single-symbol table with wt=(+1,+1); ports 4-7 repeat the freq
    pattern with time OCC wt=(+1,-1) across the symbol pair."""
    base = port % 4
    wf, delta = dmrs_type1_port_weights(base)
    wt = np.array([1.0, 1.0 if port < 4 else -1.0], dtype=np.float32)
    return wf, wt, delta


def pss_sequence(n_id2: int) -> np.ndarray:
    """TS 38.211 §7.4.2.2: 127-length BPSK m-sequence (host constant)."""
    x = np.zeros(127, dtype=np.int64)
    x[:7] = [0, 1, 1, 0, 1, 1, 1]
    for i in range(127 - 7):
        x[i + 7] = (x[i + 4] + x[i]) % 2
    m = (np.arange(127) + 43 * n_id2) % 127
    return (1 - 2 * x[m]).astype(np.float32)


def sss_sequence(n_id1: int, n_id2: int) -> np.ndarray:
    """TS 38.211 §7.4.2.3: 127-length SSS (host constant)."""
    x0 = np.zeros(127, dtype=np.int64)
    x1 = np.zeros(127, dtype=np.int64)
    x0[0] = 1
    x1[0] = 1
    for i in range(127 - 7):
        x0[i + 7] = (x0[i + 4] + x0[i]) % 2
        x1[i + 7] = (x1[i + 1] + x1[i]) % 2
    m0 = 15 * (n_id1 // 112) + 5 * n_id2
    m1 = n_id1 % 112
    n = np.arange(127)
    return ((1 - 2 * x0[(n + m0) % 127]) * (1 - 2 * x1[(n + m1) % 127])).astype(np.float32)


# --------------------------------------------------------------------------
# Low-PAPR sequences of arbitrary length (TS 38.211 §5.2.2) — SRS / PUCCH
# --------------------------------------------------------------------------

def _largest_prime_below(n: int) -> int:
    for c in range(n - 1, 1, -1):
        if all(c % k for k in range(2, int(c ** 0.5) + 1)):
            return c
    raise ValueError(n)


def low_papr_sequence(u: int, v: int, length: int) -> np.ndarray:
    """Base sequence r_{u,v}(n) for M >= 36 (ZC with cyclic extension).

    TS 38.211 §5.2.2.1: N_ZC = largest prime < M; q from u, v;
    x_q(m) = exp(-j pi q m (m+1) / N_ZC); r(n) = x_q(n mod N_ZC).
    (Short lengths 6..24 use the phi tables in models/pucch.py.)
    """
    n_zc = _largest_prime_below(length)
    qbar = n_zc * (u + 1) / 31.0
    q = int(np.floor(qbar + 0.5)) + v * (-1) ** int(np.floor(2 * qbar))
    m = np.arange(n_zc, dtype=np.float64)
    x = np.exp(-1j * np.pi * q * m * (m + 1) / n_zc)
    return x[np.arange(length) % n_zc].astype(np.complex64)


# --------------------------------------------------------------------------
# SRS generation (TS 38.211 §6.4.1.4) — P28 analog (srs_rx.c / ul_ref_seq)
# --------------------------------------------------------------------------

def srs_sequence(n_prb: int, comb: int = 2, u: int = 0, v: int = 0,
                 cyclic_shift: int = 0, n_cs_max: int = 8) -> np.ndarray:
    """(m_sc,) SRS sequence: low-PAPR base with cyclic shift alpha.

    m_sc = n_prb * 12 / comb subcarriers (comb-KTC mapping).
    """
    m_sc = n_prb * 12 // comb
    base = low_papr_sequence(u, v, m_sc)
    alpha = 2 * np.pi * cyclic_shift / n_cs_max
    n = np.arange(m_sc)
    return (np.exp(1j * alpha * n) * base).astype(np.complex64)


def srs_sc_indices(n_prb: int, comb: int = 2, comb_offset: int = 0) -> np.ndarray:
    """Subcarrier indices of the SRS comb within the sounded PRBs."""
    return (np.arange(n_prb * 12 // comb) * comb + comb_offset).astype(np.int32)


# --------------------------------------------------------------------------
# CSI-RS (TS 38.211 §7.4.1.5) — single-port row-1-style generation
# --------------------------------------------------------------------------

def csirs_cinit(slot: int, symbol: int, n_id: int, symbols_per_slot: int = 14) -> int:
    return ((1 << 10) * (symbols_per_slot * slot + symbol + 1) * (2 * n_id + 1)
            + n_id) % (1 << 31)


def csirs_sequence(cinit, n_re: int) -> jnp.ndarray:
    """Gold-seeded QPSK CSI-RS values (same mapping as DMRS sequences)."""
    return dmrs_sequence(cinit, n_re)


# --------------------------------------------------------------------------
# PTRS (TS 38.211 §6.4.1.2) — phase-tracking RS for PUSCH
# --------------------------------------------------------------------------

def ptrs_sc_indices(n_prb: int, k_ptrs: int = 2, re_offset: int = 0) -> np.ndarray:
    """One PTRS subcarrier every K_PTRS PRBs (density-1 frequency pattern)."""
    prbs = np.arange(0, n_prb, k_ptrs)
    return (prbs * 12 + re_offset).astype(np.int32)


def estimate_common_phase(y: jnp.ndarray, h: jnp.ndarray, pilots: jnp.ndarray) -> jnp.ndarray:
    """Per-symbol common phase error from PTRS REs.

    y: (..., n_sym, n_ptrs) received PTRS REs; h: channel at those REs
    (same shape or broadcastable); pilots: (n_ptrs,) reference values.
    Returns (..., n_sym) unit-magnitude phasors exp(-j phi_hat) to apply
    to the data REs (nr_pusch_ptrs_processing:498 analog).
    """
    z = jnp.sum(y * jnp.conj(h * pilots), axis=-1)
    return jnp.conj(z / jnp.maximum(jnp.abs(z), 1e-12))


# --------------------------------------------------------------------------
# PRS — positioning reference signal (TS 38.211 §7.4.1.7), Rel-16
# --------------------------------------------------------------------------

def prs_cinit(slot: int, symbol: int, n_id_prs: int, symbols_per_slot: int = 14) -> int:
    """TS 38.211 7.4.1.7.1 sequence init."""
    return (
        ((1 << 22) * (n_id_prs // 1024)
         + (1 << 10) * (symbols_per_slot * slot + symbol + 1) * (2 * (n_id_prs % 1024) + 1)
         + (n_id_prs % 1024)) % (1 << 31)
    )


def prs_sequence(cinit, n_re: int) -> jnp.ndarray:
    """Gold-seeded QPSK PRS values."""
    return dmrs_sequence(cinit, n_re)


def prs_staircase_offsets(comb_size: int, n_symbols: int, re_offset: int = 0) -> np.ndarray:
    """Per-symbol subcarrier offset of the PRS comb (staircase pattern,
    TS 38.211 Table 7.4.1.7.3-1), for comb sizes 2/4/6/12."""
    patterns = {
        2: [0, 1],
        4: [0, 2, 1, 3],
        6: [0, 3, 1, 4, 2, 5],
        12: [0, 6, 3, 9, 1, 7, 4, 10, 2, 8, 5, 11],
    }
    pat = patterns[comb_size]
    return np.array([(re_offset + pat[l % len(pat)]) % comb_size
                     for l in range(n_symbols)], dtype=np.int32)
