"""PDCCH / DCI chain (P19 analog): polar-coded DCI + CORESET mapping.

Reference anchors: TX nr_generate_dci_top (openair1/PHY/NR_TRANSPORT/
nr_dci.c:260, polar call :154); UE blind decode nr_dci_decoding_procedure
(openair1/PHY/NR_UE_TRANSPORT/dci_nr.c:768).

DCI coding per TS 38.212 §7.3: 24 ones prepended for CRC computation,
CRC24C scrambled by RNTI, polar with IL=1, E = 108 * 2^AL QPSK bits
(AL = aggregation level, 6 REGs per CCE, 9 data REs + 3 DMRS per REG).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..coding import polar
from ..coding.crc import crc_compute
from ..phy import refsig
from ..phy.channel_estimation import ls_estimate
from ..phy.llr import llrs as llr_compute
from ..phy.modulation import modulate
from ..phy.scrambling import gold_sequence, scramble_llrs


@dataclasses.dataclass(frozen=True)
class DciConfig:
    A: int = 39                  # DCI payload bits (format 1_1-ish)
    aggregation_level: int = 4   # 1/2/4/8/16 CCEs
    rnti: int = 0x1234
    n_id: int = 0                # pdcch DMRS scrambling id
    start_symbol: int = 0
    coreset_prb: int = 48        # CORESET width (6 PRB per CCE, 1-symbol)

    @property
    def E(self) -> int:
        return 108 * self.aggregation_level  # 54 QPSK syms/CCE * 2 bits

    @property
    def K(self) -> int:
        return self.A + 24


def _params(cfg: DciConfig):
    return polar.polar_params(K=cfg.K, E=cfg.E, n_max=9, i_il=True)


def dci_encode(cfg: DciConfig, payload: jnp.ndarray) -> jnp.ndarray:
    """(B, A) DCI bits -> (B, E) coded bits.

    CRC24C computed over (24 ones ++ payload); last 16 CRC bits XOR RNTI
    (TS 38.212 §7.3.2).
    """
    B = payload.shape[0]
    ones = jnp.ones((B, 24), jnp.int8)
    crc = crc_compute(jnp.concatenate([ones, payload.astype(jnp.int8)], axis=-1), "24C")
    rnti_bits = jnp.asarray([(cfg.rnti >> (15 - i)) & 1 for i in range(16)], jnp.int8)
    crc = crc.at[:, 8:].set(crc[:, 8:] ^ rnti_bits[None])
    k_bits = jnp.concatenate([payload.astype(jnp.int8), crc], axis=-1)
    return polar.encode(_params(cfg), k_bits)


def dci_decode(cfg: DciConfig, llr_e: jnp.ndarray, list_size: int = 8):
    """(B, E) LLRs -> ((B, A) payload, ok (B,)): CA-SCL with RNTI-masked CRC."""
    p = _params(cfg)
    llr_n = polar.rate_recover_llr(p, llr_e)
    cands, metrics = polar.scl_decode(p, llr_n, list_size)
    payload, rx_crc = cands[..., :-24], cands[..., -24:]
    B, L = payload.shape[:2]
    ones = jnp.ones((B, L, 24), jnp.int8)
    calc = crc_compute(jnp.concatenate([ones, payload], axis=-1), "24C")
    rnti_bits = jnp.asarray([(cfg.rnti >> (15 - i)) & 1 for i in range(16)], jnp.int8)
    calc = calc.at[..., 8:].set(calc[..., 8:] ^ rnti_bits[None, None])
    ok = jnp.all(calc == rx_crc, axis=-1)
    any_ok = jnp.any(ok, axis=1)
    pick = jnp.where(any_ok, jnp.argmax(ok, axis=1), 0)
    sel = jnp.take_along_axis(payload, pick[:, None, None], axis=1)[:, 0]
    return sel, any_ok


# --- CORESET RE mapping (non-interleaved, 1-symbol) -------------------------

def _pdcch_positions(cfg: DciConfig):
    """Data + DMRS subcarrier indices for AL CCEs starting at CCE 0.

    REG = 1 PRB x 1 symbol; DMRS on SCs 1,5,9 of each PRB (38.211 7.4.1.3).
    """
    n_prb = 6 * cfg.aggregation_level
    sc = np.arange(12 * n_prb)
    dmrs = sc[sc % 4 == 1]
    data = sc[sc % 4 != 1]
    return data.astype(np.int32), dmrs.astype(np.int32), n_prb


def pdcch_tx_grid(cfg: DciConfig, payload: jnp.ndarray, slot: int = 0) -> jnp.ndarray:
    """(B, A) DCI -> (B, 12*coreset_prb) REs for the CORESET symbol."""
    B = payload.shape[0]
    bits = dci_encode(cfg, payload)
    # codeword scrambling (38.211 7.3.2.3): cinit = (rnti<<16 + n_id) mod 2^31
    cinit = ((cfg.rnti << 16) + cfg.n_id) % (1 << 31)
    c = gold_sequence(jnp.uint32(cinit), cfg.E)
    syms = modulate(bits ^ c, 2)
    data_sc, dmrs_sc, n_prb = _pdcch_positions(cfg)
    out = jnp.zeros((B, 12 * cfg.coreset_prb), jnp.complex64)
    out = out.at[:, jnp.asarray(data_sc)].set(syms)
    # PDCCH DMRS (38.211 7.4.1.3): gold per symbol over the whole CORESET
    cinit_d = refsig.dmrs_cinit(slot, cfg.start_symbol, cfg.n_id)
    pil_full = refsig.dmrs_sequence(cinit_d, 3 * cfg.coreset_prb)
    out = out.at[:, jnp.asarray(dmrs_sc)].set(pil_full[: len(dmrs_sc)])
    return out


def pdcch_rx(cfg: DciConfig, rx_res: jnp.ndarray, slot: int = 0, list_size: int = 8):
    """(B, n_rx, 12*coreset_prb) CORESET symbol REs -> DCI decode.

    LS estimate on PDCCH DMRS + MRC + QPSK LLRs + descramble + SCL.
    """
    data_sc, dmrs_sc, n_prb = _pdcch_positions(cfg)
    cinit_d = refsig.dmrs_cinit(slot, cfg.start_symbol, cfg.n_id)
    pil = refsig.dmrs_sequence(cinit_d, 3 * cfg.coreset_prb)[: len(dmrs_sc)]
    yp = rx_res[..., jnp.asarray(dmrs_sc)]
    hp = ls_estimate(yp, pil)
    nearest = np.abs(data_sc[None, :] - dmrs_sc[:, None]).argmin(axis=0)
    h = hp[..., jnp.asarray(nearest)]
    yd = rx_res[..., jnp.asarray(data_sc)]
    x = jnp.sum(jnp.conj(h) * yd, axis=1)
    mag = jnp.sum(jnp.abs(h) ** 2, axis=1)
    llr = llr_compute(x, mag, 2)
    cinit = ((cfg.rnti << 16) + cfg.n_id) % (1 << 31)
    llr = scramble_llrs(llr, jnp.uint32(cinit))
    return dci_decode(cfg, llr, list_size=list_size)


def blind_search(rx_res: jnp.ndarray, A: int, rnti: int,
                 aggregation_levels=(1, 2, 4, 8), n_id: int = 0,
                 coreset_prb: int = 48, slot: int = 0, list_size: int = 8):
    """UE-side DCI blind decode over aggregation-level hypotheses.

    Mirrors nr_dci_decoding_procedure (dci_nr.c:768): try each AL's
    candidate at CCE 0, return the first CRC-passing payload.  All
    hypotheses run batched; the RNTI-masked CRC is the detector.
    Returns (payload (B, A), found (B,), al (B,)).
    """
    B = rx_res.shape[0]
    best_payload = jnp.zeros((B, A), jnp.int8)
    found = jnp.zeros((B,), bool)
    al_out = jnp.zeros((B,), jnp.int32)
    for al in aggregation_levels:
        if 6 * al > coreset_prb:
            continue
        cfg = DciConfig(A=A, aggregation_level=al, rnti=rnti, n_id=n_id,
                        coreset_prb=coreset_prb)
        sub = rx_res[..., : 12 * 6 * al]
        cfg_sub = DciConfig(A=A, aggregation_level=al, rnti=rnti, n_id=n_id,
                            coreset_prb=6 * al)
        bits, ok = pdcch_rx(cfg_sub, sub, slot=slot, list_size=list_size)
        take = ok & ~found
        best_payload = jnp.where(take[:, None], bits, best_payload)
        al_out = jnp.where(take, al, al_out)
        found = found | ok
    return best_payload, found, al_out
