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


@dataclasses.dataclass(frozen=True)
class PrachConfig:
    l_ra: int = 839             # 839 (formats 0-3) or 139 (A/B formats)
    roots: tuple = (129,)       # physical root sequence indices u
    n_cs: int = 13              # cyclic shift step (zeroCorrelationZone)
    n_ifft: int = 1024          # correlation IFFT size (>= l_ra)
    threshold: float = 10.0     # peak/mean detection threshold

    @property
    def shifts_per_root(self) -> int:
        return self.l_ra // self.n_cs if self.n_cs else 1


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

    Preamble i maps to root roots[i // shifts_per_root] with cyclic shift
    v = i % shifts_per_root (TS 38.211 6.3.3.1).
    """
    spr = cfg.shifts_per_root
    tables = []
    for u in cfg.roots:
        xf = zc_freq(u, cfg.l_ra)
        for v in range(spr):
            # time-domain cyclic shift by C_v = phase ramp in frequency
            cv = v * cfg.n_cs
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
    spr = cfg.shifts_per_root
    n_pre = len(cfg.roots) * spr
    win = cfg.n_ifft * cfg.n_cs // cfg.l_ra   # shift window in IFFT samples
    peaks = []
    for u in cfg.roots:
        xf = jnp.asarray(np.conj(zc_freq(u, cfg.l_ra)))
        prod = rx_freq * xf                    # (B, R, L)
        corr = jnp.fft.ifft(prod, n=cfg.n_ifft, axis=-1)
        power = jnp.sum(jnp.abs(corr) ** 2, axis=1)  # (B, n_ifft) over rx ants
        for v in range(spr):
            # window for shift v: time offsets [-Cv .. -Cv + win) mod n_ifft
            start = (cfg.n_ifft - (v * cfg.n_cs * cfg.n_ifft) // cfg.l_ra) % cfg.n_ifft
            idx = (start + np.arange(max(win, 1))) % cfg.n_ifft
            w = power[:, jnp.asarray(idx)]
            peaks.append((jnp.max(w, axis=-1), jnp.argmax(w, axis=-1)))
    peak_pow = jnp.stack([p for p, _ in peaks], axis=1)   # (B, n_pre)
    peak_pos = jnp.stack([q for _, q in peaks], axis=1)
    mean_pow = jnp.mean(jnp.sum(jnp.abs(rx_freq) ** 2, axis=1), axis=-1) / cfg.n_ifft * cfg.l_ra
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
                           threshold=self.threshold)


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
