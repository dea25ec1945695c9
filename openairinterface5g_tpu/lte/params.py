"""LTE frame parameters + subframe OFDM (TS 36.211 §6.2, §6.12).

Replaces the reference's LTE_DL_FRAME_PARMS init (openair1/PHY/INIT/
lte_parms.c) and PHY_ofdm_mod / slot FEP for the 4G numerology: 15 kHz
SCS, 0.5 ms slots of 7 symbols (normal CP), processed here per 1 ms
subframe (14 symbols) as one batched FFT — the unit the LTE PHY
schedules on (TTI).
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

# n_rb -> FFT size (36.101 bandwidths 1.4/3/5/10/15/20 MHz)
_LTE_FFT = {6: 128, 15: 256, 25: 512, 50: 1024, 75: 1536, 100: 2048}


@dataclasses.dataclass(frozen=True)
class LteFrameParams:
    """Static subframe geometry (normal CP)."""

    n_rb: int
    fft_size: int
    symbols_per_slot: int = 7          # normal CP

    @property
    def n_sc(self) -> int:
        return 12 * self.n_rb

    @property
    def sample_rate(self) -> float:
        return float(self.fft_size * 15_000)

    @property
    def symbols_per_subframe(self) -> int:
        return 2 * self.symbols_per_slot

    @property
    def cp_samples(self) -> int:
        """Normal CP (symbols 1..6 of each slot): 144 at FFT 2048."""
        return self.fft_size * 144 // 2048

    @property
    def cp0_samples(self) -> int:
        """First-symbol CP of each slot: 160 at FFT 2048."""
        return self.fft_size * 160 // 2048

    def cp_lengths(self) -> np.ndarray:
        """(14,) CP length per subframe symbol."""
        cps = np.full(self.symbols_per_subframe, self.cp_samples, np.int64)
        cps[0] = cps[self.symbols_per_slot] = self.cp0_samples
        return cps

    @property
    def samples_per_subframe(self) -> int:
        return int(self.cp_lengths().sum()) + self.fft_size * self.symbols_per_subframe

    def symbol_offsets(self) -> np.ndarray:
        sizes = self.cp_lengths() + self.fft_size
        return np.concatenate([[0], np.cumsum(sizes)[:-1]])

    @property
    def first_carrier(self) -> int:
        """FFT bin of the lowest occupied subcarrier.  LTE leaves DC empty
        on DL; occupied bins are first_carrier..-1 then 1..n_sc/2."""
        return self.fft_size - self.n_sc // 2


@functools.lru_cache(maxsize=8)
def make_lte_frame_params(n_rb: int) -> LteFrameParams:
    return LteFrameParams(n_rb=n_rb, fft_size=_LTE_FFT[n_rb])


def map_to_grid(fp: LteFrameParams, re_values: jnp.ndarray) -> jnp.ndarray:
    """(..., 14, n_sc) REs -> (..., 14, fft) grid, skipping DC (DL)."""
    idx = _sc_to_bin(fp)
    lead = re_values.shape[:-1]
    grid = jnp.zeros((*lead, fp.fft_size), dtype=re_values.dtype)
    return grid.at[..., jnp.asarray(idx)].set(re_values)


def extract_from_grid(fp: LteFrameParams, grid: jnp.ndarray) -> jnp.ndarray:
    return grid[..., jnp.asarray(_sc_to_bin(fp))]


def _sc_to_bin(fp: LteFrameParams) -> np.ndarray:
    half = fp.n_sc // 2
    neg = fp.first_carrier + np.arange(half)        # negative freqs
    pos = 1 + np.arange(half)                       # positive, DC skipped
    return np.concatenate([neg, pos])


def ofdm_modulate(fp: LteFrameParams, grid: jnp.ndarray) -> jnp.ndarray:
    """(..., 14, fft) freq grid -> (..., samples) subframe."""
    x = jnp.fft.ifft(grid, axis=-1).astype(jnp.complex64) * jnp.sqrt(
        jnp.float32(fp.fft_size))
    cps = fp.cp_lengths()
    parts = []
    for l in range(fp.symbols_per_subframe):
        sym = x[..., l, :]
        parts.append(jnp.concatenate([sym[..., -int(cps[l]):], sym], axis=-1))
    return jnp.concatenate(parts, axis=-1)


def ofdm_demodulate(fp: LteFrameParams, samples: jnp.ndarray) -> jnp.ndarray:
    """(..., samples) subframe -> (..., 14, fft) freq grid."""
    offs = fp.symbol_offsets()
    cps = fp.cp_lengths()
    syms = []
    for l in range(fp.symbols_per_subframe):
        start = int(offs[l] + cps[l])
        syms.append(samples[..., start: start + fp.fft_size])
    x = jnp.stack(syms, axis=-2)
    return jnp.fft.fft(x, axis=-1).astype(jnp.complex64) / jnp.sqrt(
        jnp.float32(fp.fft_size))
