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
