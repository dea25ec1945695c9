"""UE receive pipeline: sync -> PBCH -> PDCCH blind decode -> PDSCH.

The nr-uesoftmodem analog (executables/nr-ue.c UE_thread state machine ->
pbch_pdcch_processing / pdsch_processing, SURVEY.md §3.5) at simulation
level.  DCI payloads carry a compact scheduling grant (mcs / PRB
allocation / rv) that the UE parses on the host to configure its PDSCH
receiver — the config is static per grant, so each distinct grant shape
compiles once (the blind-decode -> reconfigure boundary is exactly the
reference's DCI-to-PDSCH config path).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .pdcch import blind_search
from .pdsch import PdschConfig


# compact DCI "format 1_0-lite" payload layout (bits, MSB first);
# bwp = bandwidth-part indicator (38.212 7.3.1.1.2 field analog)
_FIELD_BITS = (("mcs", 5), ("prb_start", 9), ("n_prb", 9), ("rv", 2),
               ("ndi", 1), ("harq_id", 4), ("bwp", 2))
DCI_A = sum(b for _, b in _FIELD_BITS) + 7  # + reserved/padding = 39


def encode_grant(mcs: int, prb_start: int, n_prb: int, rv: int = 0,
                 ndi: int = 1, harq_id: int = 0, bwp: int = 0) -> np.ndarray:
    """Pack a scheduling grant into a (DCI_A,) bit array."""
    vals = {"mcs": mcs, "prb_start": prb_start, "n_prb": n_prb, "rv": rv,
            "ndi": ndi, "harq_id": harq_id, "bwp": bwp}
    bits = []
    for name, nb in _FIELD_BITS:
        v = vals[name]
        bits.extend((v >> (nb - 1 - i)) & 1 for i in range(nb))
    bits.extend([0] * (DCI_A - len(bits)))
    return np.array(bits, dtype=np.int8)


def decode_grant(bits: np.ndarray) -> dict:
    out = {}
    i = 0
    for name, nb in _FIELD_BITS:
        v = 0
        for _ in range(nb):
            v = (v << 1) | int(bits[i])
            i += 1
        out[name] = v
    return out


@dataclasses.dataclass(frozen=True)
class UeConfig:
    mu: int = 1
    n_bwp_prb: int = 48
    rnti: int = 0x1234
    n_id: int = 0
    coreset_prb: int = 48
    coreset_symbol: int = 0
    n_rx: int = 1


def ue_receive_slot(ue: UeConfig, re_grid: jnp.ndarray, n_iters: int = 10,
                    slot: int = 0, harq_buffers=None):
    """Control+data receive: blind-decode DCI, configure + run PDSCH RX.

    re_grid: (B, n_rx, symbols, n_sc_bwp).  All trials in the batch must
    carry the same grant (one compile per grant shape).  Returns dict
    with dci fields, dci_found, tb_bits, tb_ok, harq_buffers.

    harq_buffers: previous-round soft LLR buffer for the granted HARQ
    process (caller keys its buffer store by the grant's harq_id — the
    nr_dlsch_decoding HARQ round combine, SURVEY.md P31/P14).
    """
    coreset = re_grid[:, :, ue.coreset_symbol, : 12 * ue.coreset_prb]
    dci_bits, found, al = blind_search(coreset, DCI_A, ue.rnti,
                                       n_id=ue.n_id, slot=slot,
                                       coreset_prb=ue.coreset_prb)
    found_np = np.asarray(found)
    if not found_np.any():
        return {"dci_found": found, "grant": None, "tb_bits": None,
                "tb_ok": jnp.zeros(re_grid.shape[0], bool)}
    grant = decode_grant(np.asarray(dci_bits)[int(np.argmax(found_np))])
    cfg = PdschConfig(mu=ue.mu, n_prb=grant["n_prb"], prb_start=grant["prb_start"],
                      n_bwp_prb=ue.n_bwp_prb, mcs=grant["mcs"], rnti=ue.rnti,
                      n_id=ue.n_id, n_rx=ue.n_rx,
                      start_symbol=2, n_symbols=12, dmrs_symbols=(2,))
    from .pusch import pusch_rx_grid
    out = pusch_rx_grid(cfg, re_grid, rv=grant["rv"], n_iters=n_iters,
                        harq_buffers=harq_buffers)
    return {"dci_found": found, "grant": grant, "al": al,
            "tb_bits": out["tb_bits"], "tb_ok": out["tb_ok"], "cfg": cfg,
            "harq_buffers": out["harq_buffers"]}
