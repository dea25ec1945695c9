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
