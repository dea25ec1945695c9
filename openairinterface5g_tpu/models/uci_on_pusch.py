"""UCI-on-PUSCH multiplexing (TS 38.212 §6.2.7 / §6.3.2.4).

Bit-level multiplexing as the spec does: HARQ-ACK / CSI part 1 / CSI
part 2 are independently coded (small block <=11 bits, CRC+polar
otherwise — shared uci_encode/uci_decode), then written into the G-bit
PUSCH codeword sequence at **distributed RE positions** computed at
config time (static shapes):

* each UCI stream takes n REs per symbol spaced d = floor(free/n) apart
  (the spec's distance-d allocation), starting at the first symbol after
  the first DMRS symbol for ACK and at the first data symbol for CSI;
* O_ack <= 2 uses puncturing semantics — data is mapped everywhere and
  ACK overwrites (CSI part 1 avoids the ACK candidate REs, as the spec
  reserves them); O_ack > 2 and CSI are rate-matched — the data codeword
  shrinks to G_data = G - G_ack - G_csi1 - G_csi2;
* capacity Q' per stream follows 38.212 6.3.2.4.1.1:
  Q' = min(ceil((O+L)*beta*sum M_sc_uci / sum K_r), ceil(alpha*M_uci)).

The whole multiplexed sequence is scrambled/modulated with the data
(same Qm), so UCI rides at the PUSCH modulation order as in the spec
(the x/y scrambling placeholders for 1-2 ACK bits are not replicated).

Reference anchor: nr_ulsch_ue.c UCI multiplexing, nr_uci_encoding.c,
gNB-side extraction in phy_procedures_nr_gNB.c / nr_ulsch_demodulation.
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from .pusch import PuschConfig
from .pucch import uci_encode, uci_decode


def _crc_len(O: int) -> int:
    return 0 if O <= 11 else (6 if O < 20 else 11)


@dataclasses.dataclass(frozen=True)
class UciOnPuschConfig:
    n_ack_bits: int = 2
    n_csi1_bits: int = 0
    n_csi2_bits: int = 0
    beta_ack: float = 2.0
    beta_csi1: float = 2.0
    beta_csi2: float = 2.0
    alpha: float = 0.5           # scaling cap (higher-layer 'scaling')

    @property
    def ack_punctures(self) -> bool:
        return self.n_ack_bits <= 2

    def _q_prime(self, cfg: PuschConfig, O: int, beta: float,
                 cap_re: int) -> int:
        """REs per layer for a stream (38.212 6.3.2.4.1.1 shape)."""
        if O == 0:
            return 0
        # 38.212 6.3.2.4.1.1: denominator is sum_r K_r over the UL-SCH code
        # blocks (per-CB size incl. CB CRC + filler), not TBS + TB-CRC.
        p, _ = cfg.seg_params()
        sum_kr = p.C * p.K
        m_uci = cfg.n_data_re
        q = int(np.ceil((O + _crc_len(O)) * beta * m_uci / sum_kr))
        q = min(q, int(np.ceil(self.alpha * m_uci)), cap_re)
        return max(q, 1)

    def g_sizes(self, cfg: PuschConfig) -> tuple[int, int, int, int]:
        """(G_ack, G_csi1, G_csi2, G_data) in bits."""
        a, c1, c2, _, _, _ = _build_map(cfg, self)
        per_re = cfg.n_layers * cfg.qm_rate[0]
        g_ack = len(a) * per_re
        g_csi1 = len(c1) * per_re
        g_csi2 = len(c2) * per_re
        g_data = cfg.G - g_csi1 - g_csi2 - (0 if self.ack_punctures else g_ack)
        return g_ack, g_csi1, g_csi2, g_data


@functools.lru_cache(maxsize=64)
def _build_map_cached(cfg: PuschConfig, ucfg: UciOnPuschConfig):
    """Static distributed-RE selection. Returns flat data-RE indices
    (index = data_symbol_position * M + subcarrier) for ack/csi1/csi2,
    the data-RE order (excluding rate-matched UCI REs), and the ACK
    positions within that data order (for puncturing)."""
    M = 12 * cfg.n_prb
    data_syms = list(cfg.data_symbols)
    S = len(data_syms)
    # per-symbol free RE lists
    free = {si: list(range(M)) for si in range(S)}

    first_after_dmrs = next(
        (si for si, s in enumerate(data_syms) if s > cfg.dmrs_symbols[0]), 0)

    def select(start_si: int, n_re: int, avoid: set[int] | None = None):
        chosen: list[int] = []
        si = start_si
        order = list(range(start_si, S)) + list(range(0, start_si))
        for si in order:
            if n_re <= 0:
                break
            f = [m for m in free[si]
                 if avoid is None or (si * M + m) not in avoid]
            if not f:
                continue
            take = min(len(f), n_re)
            d = len(f) // take
            picked = [f[j * d] for j in range(take)]
            for m in picked:
                free[si].remove(m)
                chosen.append(si * M + m)
            n_re -= take
        return chosen

    qm = cfg.qm_rate[0]
    # ACK candidate REs (for <=2 bits these are 'reserved' — CSI1 avoids
    # them but data still maps there; for >2 bits they are taken outright)
    q_ack = ucfg._q_prime(cfg, ucfg.n_ack_bits, ucfg.beta_ack,
                          cap_re=cfg.n_data_re // 2)
    if ucfg.ack_punctures:
        # compute candidates without removing them from free
        snapshot = {k: list(v) for k, v in free.items()}
        ack_res = select(first_after_dmrs, q_ack)
        free = snapshot
    else:
        ack_res = select(first_after_dmrs, q_ack)
    cap = cfg.n_data_re - (0 if ucfg.ack_punctures else len(ack_res))
    q_csi1 = ucfg._q_prime(cfg, ucfg.n_csi1_bits, ucfg.beta_csi1, cap_re=cap // 2)
    csi1_res = select(0, q_csi1, avoid=set(ack_res)) if ucfg.n_csi1_bits else []
    cap -= len(csi1_res)
    q_csi2 = ucfg._q_prime(cfg, ucfg.n_csi2_bits, ucfg.beta_csi2, cap_re=cap // 2)
    # CSI part 2 may land on reserved ACK candidate REs; per 38.212 6.2.7
    # the ACK (<=2 bits) then PUNCTURES CSI part 2 there (handled at demux
    # by zeroing the overlapped CSI2 LLRs).
    csi2_res = select(0, q_csi2) if ucfg.n_csi2_bits else []

    # data-RE order: everything still free, plus (if puncturing) the ACK REs
    taken = set(csi1_res) | set(csi2_res)
    if not ucfg.ack_punctures:
        taken |= set(ack_res)
    data_res = [si * M + m for si in range(S) for m in range(M)
                if (si * M + m) not in taken]
    pos_of = {re: i for i, re in enumerate(data_res)}
    csi2_pos = {re: i for i, re in enumerate(csi2_res)}
    ack_in_data, ack_in_csi2 = [], []
    if ucfg.ack_punctures:
        for re in ack_res:
            if re in csi2_pos:
                ack_in_csi2.append(csi2_pos[re])
            else:
                ack_in_data.append(pos_of[re])
    return (np.array(ack_res, np.int64), np.array(csi1_res, np.int64),
            np.array(csi2_res, np.int64), np.array(data_res, np.int64),
            np.array(ack_in_data, np.int64), np.array(ack_in_csi2, np.int64))


def _build_map(cfg, ucfg):
    return _build_map_cached(cfg, ucfg)


def _bit_idx(res: np.ndarray, per_re: int) -> np.ndarray:
    """RE indices -> codeword bit indices ((s*M+m)*L*Qm + 0..L*Qm-1)."""
    return (res[:, None] * per_re + np.arange(per_re)[None, :]).reshape(-1)


def mux_uci_bits(cfg: PuschConfig, ucfg: UciOnPuschConfig,
                 data_cw: jnp.ndarray, ack_bits=None,
                 csi1_bits=None, csi2_bits=None) -> jnp.ndarray:
    """data codeword (B, G_data) + UCI payloads -> (B, G) multiplexed bits."""
    ack_res, c1_res, c2_res, data_res, _, _ = _build_map(cfg, ucfg)
    per_re = cfg.n_layers * cfg.qm_rate[0]
    B = data_cw.shape[0]
    out = jnp.zeros((B, cfg.G), jnp.int8)
    out = out.at[:, jnp.asarray(_bit_idx(data_res, per_re))].set(data_cw)
    for res, bits, O in ((c1_res, csi1_bits, ucfg.n_csi1_bits),
                         (c2_res, csi2_bits, ucfg.n_csi2_bits),
                         (ack_res, ack_bits, ucfg.n_ack_bits)):
        if O and len(res):
            cw = uci_encode(O, len(res) * per_re, bits)
            out = out.at[:, jnp.asarray(_bit_idx(res, per_re))].set(cw)
    return out


def demux_uci_llrs(cfg: PuschConfig, ucfg: UciOnPuschConfig,
                   llr_cw: jnp.ndarray):
    """(B, G) descrambled LLRs -> dict of per-stream LLRs + data LLRs.

    Data LLRs have zeros at punctured ACK positions (erasures for the
    LDPC decoder), matching the reference's puncture handling; CSI part 2
    LLRs are likewise zeroed where the ACK punctured them (38.212 6.2.7).
    """
    (ack_res, c1_res, c2_res, data_res,
     ack_in_data, ack_in_csi2) = _build_map(cfg, ucfg)
    per_re = cfg.n_layers * cfg.qm_rate[0]
    out = {}
    if len(ack_res):
        out["ack"] = llr_cw[:, jnp.asarray(_bit_idx(ack_res, per_re))]
    if len(c1_res):
        out["csi1"] = llr_cw[:, jnp.asarray(_bit_idx(c1_res, per_re))]
    if len(c2_res):
        csi2 = llr_cw[:, jnp.asarray(_bit_idx(c2_res, per_re))]
        if len(ack_in_csi2):
            csi2 = csi2.at[:, jnp.asarray(_bit_idx(ack_in_csi2, per_re))].set(0.0)
        out["csi2"] = csi2
    data = llr_cw[:, jnp.asarray(_bit_idx(data_res, per_re))]
    if len(ack_in_data):
        data = data.at[:, jnp.asarray(_bit_idx(ack_in_data, per_re))].set(0.0)
    out["data"] = data
    return out


def decode_uci(cfg: PuschConfig, ucfg: UciOnPuschConfig, streams: dict):
    """Decode the UCI streams from demux_uci_llrs output."""
    per_re = cfg.n_layers * cfg.qm_rate[0]
    res = {}
    for name, O in (("ack", ucfg.n_ack_bits), ("csi1", ucfg.n_csi1_bits),
                    ("csi2", ucfg.n_csi2_bits)):
        if O and name in streams:
            bits, ok = uci_decode(O, streams[name].shape[-1], streams[name])
            res[name] = bits
            res[name + "_ok"] = ok
    return res
