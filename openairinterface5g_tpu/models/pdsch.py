"""PDSCH end-to-end chain: gNB TX (P18) -> UE RX (P30/P31).

Reference anchors: TX nr_generate_pdsch (openair1/PHY/NR_TRANSPORT/
nr_dlsch.c:56) with nr_dlsch_encoding (nr_dlsch_coding.c:262); RX
nr_rx_pdsch (openair1/PHY/NR_UE_TRANSPORT/nr_dlsch_demodulation.c:241)
with MRC (nr_dlsch_detection_mrc:1303) / ZF (nr_zero_forcing_rx:1726)
and nr_dlsch_decoding.

The DL chain is block-for-block the mirror of the UL chain (same codec,
scrambler seed formula, DMRS type 1, QAM tables; the MIMO receiver runs
at the UE instead of the gNB), so the implementation shares the batched
tensor chain in models/pusch.py; this module pins down the DL-specific
configuration (PDSCH scrambling q, UE-side ZF receiver option).
"""
from __future__ import annotations

import dataclasses

from .pusch import PuschConfig, pusch_rx, pusch_tx


@dataclasses.dataclass(frozen=True)
class PdschConfig(PuschConfig):
    """PDSCH configuration; dmrs position 2 (type A), UE receiver = MRC/MMSE.

    n_layers = transmission layers (gNB antenna ports with identity
    precoding), n_rx = UE receive antennas.
    """
    mcs_table: int = 1


def pdsch_tx(cfg: PdschConfig, tb_bits, rv: int = 0):
    """gNB-side PDSCH TX: (batch, TBS) -> (batch, n_ant, samples)."""
    return pusch_tx(cfg, tb_bits, rv=rv)


def pdsch_rx(cfg: PdschConfig, rx_samples, rv: int = 0, n_iters: int = 20,
             harq_buffers=None):
    """UE-side PDSCH RX: channel est + MRC/MMSE + LLR + LDPC decode."""
    return pusch_rx(cfg, rx_samples, rv=rv, n_iters=n_iters,
                    harq_buffers=harq_buffers)
