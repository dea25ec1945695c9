"""UCI-on-PUSCH multiplexing (TS 38.212 §6.3.2 analog, simplified mapping).

HARQ-ACK/CSI bits ride on PUSCH by puncturing data REs: the UCI is
small-block (or polar) coded to E_uci = f(beta_offset) bits, QPSK
modulated, and written over the first data REs following the DMRS
symbol (a simplified, documented deviation from the spec's exact
distributed pattern — same capacity and diversity class).  The gNB
extracts those LLRs for UCI decoding and zeroes them for the SCH
decoder (puncture semantics, as the reference does for small ACK
payloads).

Reference anchor: nr_ulsch_ue.c UCI multiplexing + pusch_rx UCI
extraction (phy_procedures_nr_gNB.c uci handling).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..coding import small_block
from ..phy.llr import llrs as llr_compute
from ..phy.modulation import modulate
from .pusch import PuschConfig


@dataclasses.dataclass(frozen=True)
class UciOnPuschConfig:
    n_ack_bits: int = 2
    beta_offset: float = 2.0     # ACK energy/capacity scaling

    def e_ack(self, cfg: PuschConfig) -> int:
        """Rate-matched ACK bits (38.212 6.3.2.4 style capacity formula,
        capped at 32*ceil): Q' ~ beta * O * R_data^-1, rounded to QPSK REs."""
        qm, r = cfg.qm_rate
        q = int(np.ceil(self.beta_offset * max(self.n_ack_bits, 1) / r))
        q = max(q, 2)
        e = 2 * q                      # QPSK bits
        e = min(e, 4 * 12 * cfg.n_prb)  # cap: at most ~4 PRBs worth
        return (e + 31) // 32 * 32     # multiple of the RM(32,k) codeword


def _uci_re_count(cfg: PuschConfig, ucfg: UciOnPuschConfig) -> int:
    return ucfg.e_ack(cfg) // 2        # QPSK symbols punctured


def mux_uci(cfg: PuschConfig, ucfg: UciOnPuschConfig, grid_re: jnp.ndarray,
            ack_bits: jnp.ndarray) -> jnp.ndarray:
    """Overwrite the first data REs after the DMRS symbol with coded ACK.

    grid_re: (B, L, symbols, n_sc_bwp) from pusch_tx_grid.
    """
    e = ucfg.e_ack(cfg)
    cw = small_block.encode(ack_bits)                   # (B, 32)
    reps = -(-e // 32)
    bits = jnp.tile(cw, (1, reps))[:, :e]
    syms = modulate(bits, 2)                            # (B, e/2)
    n_re = e // 2
    s0 = cfg.dmrs_symbols[0] + 1                        # symbol after DMRS
    a0 = cfg.sc0
    out = grid_re
    for port in range(cfg.n_layers):
        out = out.at[:, port, s0, a0: a0 + n_re].set(syms)
    return out


def demux_uci(cfg: PuschConfig, ucfg: UciOnPuschConfig,
              x: jnp.ndarray, mag: jnp.ndarray):
    """Split equalized data-symbol tensors into (UCI LLRs, punctured x/mag).

    x, mag: (B, L, S, M) compensated symbols in data-symbol order (the
    internal layout of pusch_rx_grid).  Returns (ack_llrs (B, e),
    x_punct, mag_punct) with the UCI REs zeroed for the SCH decoder.
    """
    n_re = _uci_re_count(cfg, ucfg)
    s0 = cfg.dmrs_symbols[0] + 1
    data_syms = list(cfg.data_symbols)
    si = data_syms.index(s0)
    xu = x[:, 0, si, :n_re]
    mu = mag[:, 0, si, :n_re]
    ack_llr = llr_compute(xu, mu, 2)
    x_p = x.at[:, :, si, :n_re].set(0)
    mag_p = mag.at[:, :, si, :n_re].set(0)
    return ack_llr, x_p, mag_p


def decode_ack(ucfg: UciOnPuschConfig, ack_llr: jnp.ndarray) -> jnp.ndarray:
    """(B, e_ack) LLRs -> (B, n_ack_bits) via folded RM(32,k) ML decode."""
    e = ack_llr.shape[-1]
    folded = jnp.zeros((ack_llr.shape[0], 32), ack_llr.dtype)
    folded = folded.at[:, jnp.asarray(np.arange(e) % 32)].add(ack_llr)
    return small_block.decode(folded, ucfg.n_ack_bits)
