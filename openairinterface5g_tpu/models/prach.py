"""PRACH preamble generation + detection (P27 analog).

Reference anchors: UE TX openair1/PHY/NR_UE_TRANSPORT/nr_prach.c, gNB RX
rx_nr_prach / rx_nr_prach_ru (openair1/PHY/NR_TRANSPORT/nr_prach.c:414,153).

Zadoff-Chu preambles x_u(n) = exp(-j pi u n(n+1)/L) with cyclic shifts
C_v = v*N_cs; detection is frequency-domain correlation against each
root (one elementwise multiply + zero-padded IFFT, batched over
occasions) followed by peak search per shift window — the reference's
per-root scalar loops become one (batch, root, L) tensor op.
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np


# N_CS tables, TS 38.211 Table 6.3.3.1-5 (1.25 kHz), -6 (5 kHz),
# -7 (short 15*2^mu kHz); index = zeroCorrelationZoneConfig.  Columns:
# unrestricted / restricted type A / restricted type B (get_NCS analog,
# nr_mac_common.c:665).
NCS_125_UNRESTRICTED = (0, 13, 15, 18, 22, 26, 32, 38, 46, 59, 76, 93,
                        119, 167, 279, 419)
NCS_125_RESTRICTED_A = (15, 18, 22, 26, 32, 38, 46, 55, 68, 82, 100, 128,
                        158, 202, 237)
NCS_125_RESTRICTED_B = (15, 18, 22, 26, 32, 38, 46, 55, 68, 82, 100, 118,
                        137)
NCS_5_UNRESTRICTED = (0, 13, 26, 33, 38, 41, 49, 55, 64, 76, 93, 119, 139,
                      209, 279, 419)
NCS_5_RESTRICTED_A = (36, 57, 72, 81, 89, 94, 103, 112, 121, 132, 137, 152,
                      173, 195, 216, 237)
NCS_5_RESTRICTED_B = (36, 57, 60, 63, 65, 68, 71, 77, 81, 85, 97, 109, 122,
                      137)
NCS_SHORT = (0, 2, 4, 6, 8, 10, 12, 13, 15, 17, 19, 23, 27, 34, 46, 69)


def get_ncs(index: int, fmt: str, restricted: int = 0) -> int:
    """zeroCorrelationZoneConfig -> N_CS (get_NCS analog): restricted
    sets exist only for the long 1.25/5 kHz formats."""
    if fmt in ("0", "1", "2"):
        return (NCS_125_UNRESTRICTED, NCS_125_RESTRICTED_A,
                NCS_125_RESTRICTED_B)[restricted][index]
    if fmt == "3":
        return (NCS_5_UNRESTRICTED, NCS_5_RESTRICTED_A,
                NCS_5_RESTRICTED_B)[restricted][index]
    return NCS_SHORT[index]


def nr_roots(logical_start: int, count: int, l_ra: int = 839) -> tuple:
    """Physical roots for logical indices i..i+count-1 (38.211 Table
    6.3.3.1-3/-4 — same data as LTE 36.211 Table 5.7.2-4/-5, which the
    reference shares: nr_prach.h:43 prach_root_sequence_map_0_3)."""
    from ..data.lte_tables import PRACH_ROOT_MAP_0_3, PRACH_ROOT_MAP_4
    table = PRACH_ROOT_MAP_0_3 if l_ra == 839 else PRACH_ROOT_MAP_4
    return tuple(table[(logical_start + i) % len(table)]
                 for i in range(count))


def _du(u: int, l_ra: int) -> int:
    """Doppler shift distance d_u (38.211 §6.3.3.1): the cyclic shift a
    one-subcarrier Doppler error induces on root u."""
    p = pow(u, -1, l_ra)
    return p if 2 * p < l_ra else l_ra - p


def cyclic_shifts(u: int, l_ra: int, n_cs: int, restricted: int = 0) -> tuple:
    """Allowed cyclic shifts C_v for root u (TS 38.211 §6.3.3.1).

    Unrestricted: C_v = v*N_CS.  Restricted type A/B: shifts arranged in
    groups so the Doppler aliases at +-d_u never collide with another
    preamble's zone (the high-speed sets, nr_prach_common.c fill_du
    analog).  Returns () when the root supports no shifts."""
    if restricted == 0:
        if n_cs == 0:
            return (0,)
        return tuple(range(0, (l_ra // n_cs) * n_cs, n_cs))
    du = _du(u, l_ra)
    if restricted == 1:                       # type A
        if n_cs <= du < (l_ra + 2) // 3:
            n_shift = du // n_cs
            d_start = 2 * du + n_shift * n_cs
            n_group = l_ra // d_start
            n_bar = min(max((l_ra - 2 * du - n_group * d_start) // n_cs, 0),
                        n_shift)
        elif (l_ra + 2) // 3 <= du <= (l_ra - n_cs) // 2:
            n_shift = (l_ra - 2 * du) // n_cs
            d_start = l_ra - 2 * du + n_shift * n_cs
            n_group = du // d_start
            n_bar = min(max((du - n_group * d_start) // n_cs, 0), n_shift)
        else:
            return ()
    else:                                     # type B (primary ranges)
        if n_cs <= du < l_ra // 5:
            n_shift = du // n_cs
            d_start = 4 * du + n_shift * n_cs
            n_group = l_ra // d_start
            n_bar = min(max((l_ra - 4 * du - n_group * d_start) // n_cs, 0),
                        n_shift)
        elif l_ra // 5 <= du <= (l_ra - n_cs) // 4:
            n_shift = (l_ra - 4 * du) // n_cs
            d_start = l_ra - 4 * du + n_shift * n_cs
            n_group = du // d_start
            n_bar = min(max((du - n_group * d_start) // n_cs, 0), n_shift)
        else:
            return ()                         # remaining B ranges: no shifts
    w = n_shift * n_group + n_bar
    return tuple(d_start * (v // n_shift) + (v % n_shift) * n_cs
                 for v in range(w))


@dataclasses.dataclass(frozen=True)
class PrachConfig:
    l_ra: int = 839             # 839 (formats 0-3) or 139 (A/B formats)
    roots: tuple = (129,)       # physical root sequence indices u
    n_cs: int = 13              # cyclic shift step (zeroCorrelationZone)
    n_ifft: int = 1024          # correlation IFFT size (>= l_ra)
    threshold: float = 10.0     # peak/mean detection threshold
    restricted: int = 0         # 0 | 1 (type A) | 2 (type B) high-speed set

    @property
    def shifts_per_root(self) -> int:
        return self.l_ra // self.n_cs if self.n_cs else 1

    @functools.cached_property
    def preamble_map(self) -> tuple:
        """(root u, C_v) per preamble index, roots consumed in order
        (38.211 §6.3.3.1: preambles from successive logical roots)."""
        out = []
        for u in self.roots:
            for cv in cyclic_shifts(u, self.l_ra, self.n_cs, self.restricted):
                out.append((u, cv))
        return tuple(out)

    @property
    def n_preambles(self) -> int:
        return len(self.preamble_map)


@functools.lru_cache(maxsize=32)
def zc_sequence(u: int, l_ra: int) -> np.ndarray:
    n = np.arange(l_ra, dtype=np.float64)
    return np.exp(-1j * np.pi * u * n * (n + 1) / l_ra).astype(np.complex64)


@functools.lru_cache(maxsize=32)
def zc_freq(u: int, l_ra: int) -> np.ndarray:
    """DFT of the ZC root (computed once, host side)."""
    return np.fft.fft(zc_sequence(u, l_ra)).astype(np.complex64)


def prach_tx(cfg: PrachConfig, preamble_idx: jnp.ndarray) -> jnp.ndarray:
    """(B,) preamble indices -> (B, l_ra) frequency-domain preamble.

    Preamble i maps to (root, C_v) = cfg.preamble_map[i] (TS 38.211
    6.3.3.1; restricted sets yield non-uniform shifts per root).
    """
    tables = []
    for u, cv in cfg.preamble_map:
        xf = zc_freq(u, cfg.l_ra)
        # time-domain cyclic shift by C_v = phase ramp in frequency
        ramp = np.exp(2j * np.pi * cv * np.arange(cfg.l_ra) / cfg.l_ra)
        tables.append(xf * ramp.astype(np.complex64))
    table = jnp.asarray(np.stack(tables))     # (n_preambles, L)
    return jnp.take(table, preamble_idx, axis=0)


def prach_rx(cfg: PrachConfig, rx_freq: jnp.ndarray):
    """(B, n_rx, l_ra) received freq-domain PRACH -> detection results.

    Returns dict: detected (B,) bool, preamble (B,) int32, delay (B,)
    int32 (samples at n_ifft rate), peak_metric (B,).
    """
    B = rx_freq.shape[0]
    win = cfg.n_ifft * cfg.n_cs // cfg.l_ra   # shift window in IFFT samples
    peaks = []
    corr_by_root = {}
    for u in {u for u, _ in cfg.preamble_map}:
        xf = jnp.asarray(np.conj(zc_freq(u, cfg.l_ra)))
        prod = rx_freq * xf                    # (B, R, L)
        corr = jnp.fft.ifft(prod, n=cfg.n_ifft, axis=-1)
        corr_by_root[u] = jnp.sum(jnp.abs(corr) ** 2, axis=1)  # (B, n_ifft)
    for u, cv in cfg.preamble_map:
        power = corr_by_root[u]
        # window for shift C_v: time offsets [-Cv .. -Cv + win) mod n_ifft
        start = (cfg.n_ifft - (cv * cfg.n_ifft) // cfg.l_ra) % cfg.n_ifft
        idx = (start + np.arange(max(win, 1))) % cfg.n_ifft
        w = power[:, jnp.asarray(idx)]
        peaks.append((jnp.max(w, axis=-1), jnp.argmax(w, axis=-1)))
    peak_pow = jnp.stack([p for p, _ in peaks], axis=1)   # (B, n_pre)
    peak_pos = jnp.stack([q for _, q in peaks], axis=1)
    # noise floor = mean correlation power across all lags of all searched
    # roots (the peak occupies ~1/n_ifft of it, negligible bias) — a true
    # post-correlation floor, unlike input energy which over-counts the
    # processing gain at low SNR (rx_nr_prach's noise estimate analog)
    mean_pow = sum(jnp.mean(p, axis=-1) for p in corr_by_root.values()
                   ) / len(corr_by_root)
    best = jnp.argmax(peak_pow, axis=-1)
    best_pow = jnp.take_along_axis(peak_pow, best[:, None], axis=1)[:, 0]
    metric = best_pow / jnp.maximum(mean_pow, 1e-12)
    delay = jnp.take_along_axis(peak_pos, best[:, None], axis=1)[:, 0]
    return {
        "detected": metric > cfg.threshold,
        "preamble": best.astype(jnp.int32),
        "delay": delay.astype(jnp.int32),
        "metric": metric,
    }


# --------------------------------------------------------------------------
# Time-domain PRACH (TS 38.211 Table 6.3.3.1-1/-2): long formats 0-3 and
# short formats A1..B4 integrated with the sample stream
# --------------------------------------------------------------------------

# format -> (l_ra, scs_expr, n_rep, cp_kappa)
#   scs: 'long' formats carry their own SCS in Hz; short formats use
#   15 kHz * 2^mu (the slot numerology).  cp_kappa is the spec's N_cp in
#   kappa*Ts units (long) / kappa*2^-mu*Ts units (short), converted to
#   samples as cp_kappa * fs / 30.72e6 [* 2^-mu for short].
PRACH_FORMATS = {
    "0":  (839, 1250, 1, 3168),
    "1":  (839, 1250, 2, 21024),
    "2":  (839, 1250, 4, 4688),
    "3":  (839, 5000, 4, 3168),
    "A1": (139, None, 2, 288),
    "A2": (139, None, 4, 576),
    "A3": (139, None, 6, 864),
    "B1": (139, None, 2, 216),
    "B2": (139, None, 4, 360),
    "B3": (139, None, 6, 504),
    "B4": (139, None, 12, 936),
}


@dataclasses.dataclass(frozen=True)
class PrachTdConfig:
    """Time-domain PRACH occasion at a given sample rate."""

    fmt: str = "0"
    mu: int = 1                  # slot numerology (for short formats / fs)
    sample_rate: float = 61.44e6
    k0: int = 12                 # first PRACH subcarrier bin in the PRACH FFT
    roots: tuple = (129,)
    n_cs: int = 13
    threshold: float = 10.0
    restricted: int = 0          # high-speed restricted set (long formats)

    @property
    def l_ra(self) -> int:
        return PRACH_FORMATS[self.fmt][0]

    @property
    def scs(self) -> float:
        s = PRACH_FORMATS[self.fmt][1]
        return float(s) if s else 15e3 * 2 ** self.mu

    @property
    def n_rep(self) -> int:
        return PRACH_FORMATS[self.fmt][2]

    @property
    def n_fft(self) -> int:
        n = self.sample_rate / self.scs
        assert abs(n - round(n)) < 1e-9, "sample rate not a multiple of PRACH SCS"
        return int(round(n))

    @property
    def cp_samples(self) -> int:
        cp_k = PRACH_FORMATS[self.fmt][3]
        scale = self.sample_rate / 30.72e6
        if PRACH_FORMATS[self.fmt][1] is None:  # short: kappa*2^-mu units
            scale /= 2 ** self.mu
        return int(round(cp_k * scale))

    @property
    def n_samples(self) -> int:
        return self.cp_samples + self.n_rep * self.n_fft

    def freq_cfg(self) -> PrachConfig:
        return PrachConfig(l_ra=self.l_ra, roots=self.roots, n_cs=self.n_cs,
                           n_ifft=1024 if self.l_ra == 839 else 256,
                           threshold=self.threshold,
                           restricted=self.restricted)


def prach_td_tx(cfg: PrachTdConfig, preamble_idx: jnp.ndarray) -> jnp.ndarray:
    """(B,) preamble indices -> (B, n_samples) time-domain PRACH burst.

    L_RA subcarriers at the PRACH SCS placed at bins k0..k0+L_RA-1 of the
    PRACH-sized IFFT, repeated n_rep times with one long CP (the spec's
    single-CP multi-repetition structure; rx_nr_prach_ru analog is the
    inverse).
    """
    xf = prach_tx(cfg.freq_cfg(), preamble_idx)          # (B, L)
    B = xf.shape[0]
    spec = jnp.zeros((B, cfg.n_fft), jnp.complex64)
    spec = spec.at[:, cfg.k0: cfg.k0 + cfg.l_ra].set(xf)
    sym = jnp.fft.ifft(spec, axis=-1) * np.sqrt(cfg.n_fft)
    body = jnp.tile(sym, (1, cfg.n_rep))
    cp = body[:, -cfg.cp_samples:] if cfg.cp_samples else body[:, :0]
    return jnp.concatenate([cp, body], axis=-1).astype(jnp.complex64)


def prach_td_rx(cfg: PrachTdConfig, rx: jnp.ndarray):
    """(B, n_rx, >= n_samples) samples -> detection dict (see prach_rx).

    CP removal, per-repetition FFT, coherent average across repetitions
    (the long-format integration gain), L_RA bin extraction, then the
    frequency-domain correlator.
    """
    body = rx[..., cfg.cp_samples: cfg.cp_samples + cfg.n_rep * cfg.n_fft]
    reps = body.reshape(*body.shape[:-1], cfg.n_rep, cfg.n_fft)
    spec = jnp.fft.fft(reps, axis=-1) / np.sqrt(cfg.n_fft)
    spec = jnp.mean(spec, axis=-2)                       # coherent combine
    bins = spec[..., cfg.k0: cfg.k0 + cfg.l_ra]
    return prach_rx(cfg.freq_cfg(), bins)
