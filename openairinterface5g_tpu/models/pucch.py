"""PUCCH formats 0-4 (P26 analog): UCI TX + gNB RX.

Reference anchors: nr_decode_pucch0 (openair1/PHY/NR_TRANSPORT/
pucch_rx.c:150), nr_decode_pucch2 (:1014), UE TX pucch_nr.c:54-834
(nr_generate_pucch3_4 at pucch_nr.c:1319).

Format 0: sequence selection — a length-12 low-PAPR sequence cyclically
shifted by the UCI value; detection is one correlation matmul against
all candidate shifts (batched over trials/occasions).
Format 1: sequence-modulated BPSK/QPSK with time-domain OCC.
Format 2: UCI bits -> small block (<=11 bits) or polar (>=12) -> QPSK
over N PRBs with comb DMRS; RX = LS estimate + MRC + LLR + decode.
Formats 3/4: DFT-s-OFDM — coded UCI scrambled, QPSK (or pi/2-BPSK),
format 4 adds pre-DFT block-wise OCC (SF 2/4), DFT spread over
Msc = 12*n_prb, low-PAPR DMRS symbols; RX inverts with the shared
transform-precoding despreader.
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ..coding import polar, small_block
from ..coding.crc import crc_attach, CRC_POLYS
from ..data.tables import _load_npz
from ..phy import refsig
from ..phy.channel_estimation import ls_estimate
from ..phy.llr import llrs as llr_compute
from ..phy.modulation import modulate
from ..phy.scrambling import gold_sequence, scramble_llrs


# --------------------------------------------------------------------------
# Low-PAPR sequences (TS 38.211 §5.2.2)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def low_papr_base(u: int, m_zc: int = 12) -> np.ndarray:
    """r_u(n) = exp(j*phi(n)*pi/4) for M_ZC in {6,12,18,24}."""
    phi = _load_npz()[f"phi{m_zc}"][u]
    return np.exp(1j * phi.astype(np.float64) * np.pi / 4).astype(np.complex64)


def cyclic_shifted(u: int, alpha_idx: int, m_zc: int = 12) -> np.ndarray:
    """r_{u,alpha}(n) = e^{j*2*pi*alpha_idx*n/m_zc} r_u(n)."""
    base = low_papr_base(u, m_zc)
    n = np.arange(m_zc)
    return (np.exp(2j * np.pi * alpha_idx * n / m_zc) * base).astype(np.complex64)


# --------------------------------------------------------------------------
# Per-symbol hopping state (shared by formats 0/1)
# --------------------------------------------------------------------------

def _ncs_symbol(hopping_id: int, slot: int, symbol: int,
                symbols_per_slot: int = 14) -> int:
    """n_cs(n_s, l) — TS 38.211 §6.3.2.2.2: 8 Gold bits per (slot, symbol)
    seeded by the hopping id (reference pucch_nr.c alpha computation)."""
    from ..phy.hopping import _gold_bits_host
    off = 8 * (symbols_per_slot * slot + symbol)
    c = _gold_bits_host(hopping_id, off + 8).astype(np.int64)
    return int((c[off: off + 8] * (1 << np.arange(8))).sum())


def _symbol_states(cfg) -> list[tuple[int, int, int]]:
    """Per PUCCH symbol: (u, n_cs, hop).  Intra-slot frequency hopping
    splits the symbols at floor(N/2) (TS 38.211 §6.3.2.4.1); group /
    sequence hopping gives each hop its own sequence group u."""
    from ..phy.hopping import group_sequence_uv
    states = []
    n_first = cfg.n_symbols // 2 if cfg.intra_slot_hopping else cfg.n_symbols
    for i in range(cfg.n_symbols):
        hop = 1 if (cfg.intra_slot_hopping and i >= n_first) else 0
        u, _ = group_sequence_uv(cfg.hopping_id, cfg.group_hopping,
                                 cfg.slot, hop)
        ncs = _ncs_symbol(cfg.hopping_id, cfg.slot, cfg.start_symbol + i)
        states.append((u, ncs, hop))
    return states


# --------------------------------------------------------------------------
# Format 0
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Pucch0Config:
    n_bits: int = 1             # 1 or 2 HARQ-ACK bits
    initial_cs: int = 0
    hopping_id: int = 0
    n_symbols: int = 1
    start_symbol: int = 13
    slot: int = 0
    group_hopping: str = "neither"   # 'neither' | 'enable' | 'disable'
    intra_slot_hopping: bool = False
    second_hop_prb: int = 0          # PRB of the 2nd hop (grid mapper use)

    @property
    def shifts(self) -> tuple:
        """m_cs per UCI value (TS 38.213 Table 9.2.3-3/-4)."""
        return (0, 6) if self.n_bits == 1 else (0, 3, 6, 9)


def _f0_candidate_table(cfg: Pucch0Config) -> np.ndarray:
    """(n_symbols, 12, 12): candidate sequence per (symbol, m_cs) with the
    spec's per-symbol alpha = 2pi/12 * (m0 + m_cs + n_cs(ns,l)) mod 12 and
    per-hop sequence group u (TS 38.211 §6.3.2.2.2)."""
    out = np.empty((cfg.n_symbols, 12, 12), np.complex64)
    for i, (u, ncs, _) in enumerate(_symbol_states(cfg)):
        for m in range(12):
            out[i, m] = cyclic_shifted(u, (cfg.initial_cs + m + ncs) % 12)
    return out


def pucch0_tx(cfg: Pucch0Config, uci: jnp.ndarray) -> jnp.ndarray:
    """(B,) UCI values -> (B, n_symbols, 12) sequence symbols."""
    table = jnp.asarray(_f0_candidate_table(cfg))     # (S, 12, 12)
    mcs = jnp.asarray(np.array(cfg.shifts, dtype=np.int32))[uci]  # (B,)
    return jnp.take(table, mcs % 12, axis=1).swapaxes(0, 1)  # (B, S, 12)


def pucch0_rx(cfg: Pucch0Config, rx: jnp.ndarray):
    """(B, n_rx, n_symbols, 12) received REs -> (uci (B,), metric).

    Correlates against all candidate shifts (nr_decode_pucch0 analog) —
    one matmul on the MXU; also returns the per-candidate energies as a
    DTX-detection statistic.
    """
    full = _f0_candidate_table(cfg)                   # (S, 12, 12)
    cands = full[:, np.array(cfg.shifts)]             # (S, n_cand, 12)
    table = jnp.asarray(np.conj(cands))
    corr = jnp.einsum("brsk,sck->brsc", rx, table)    # coherent per symbol
    energy = jnp.sum(jnp.abs(corr) ** 2, axis=(1, 2))  # (B, n_cand)
    uci = jnp.argmax(energy, axis=-1)
    return uci, energy


# --------------------------------------------------------------------------
# Format 2
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Pucch2Config:
    n_bits: int = 4
    n_prb: int = 4
    n_symbols: int = 1
    start_symbol: int = 13
    rnti: int = 0x1234
    n_id: int = 0       # scrambling id
    n_id0: int = 0      # DMRS scrambling

    @property
    def data_sc_per_prb(self) -> int:
        return 8  # DMRS on SCs 1,4,7,10 per PRB (38.211 6.4.1.3.2.2)

    @property
    def E(self) -> int:
        return self.data_sc_per_prb * self.n_prb * self.n_symbols * 2  # QPSK


def _pucch2_positions(cfg: Pucch2Config):
    sc = np.arange(12 * cfg.n_prb)
    dmrs = sc[sc % 3 == 1]
    data = sc[sc % 3 != 1]
    return data.astype(np.int32), dmrs.astype(np.int32)


def uci_encode(n_bits: int, E: int, uci: jnp.ndarray) -> jnp.ndarray:
    """(B, n_bits) -> (B, E) coded UCI bits (TS 38.212 §6.3.1.3).

    <=11 bits: small block (RM 32,K) circularly repeated to E;
    >=12: CRC6/11 + polar with i_bil interleaving.
    """
    if n_bits <= 11:
        cw = small_block.encode(uci)
        reps = -(-E // 32)
        return jnp.tile(cw, (1, reps))[:, :E]
    crc_name = "11" if n_bits >= 20 else "6"
    n_pc = 0 if n_bits >= 20 else 3
    K = n_bits + CRC_POLYS[crc_name][0]
    p = polar.polar_params(K=K, E=E, n_max=10, i_il=False, n_pc=n_pc, i_bil=True)
    return polar.encode(p, crc_attach(uci, crc_name))


def uci_decode(n_bits: int, E: int, llr: jnp.ndarray, list_size: int = 8):
    """(B, E) LLRs -> (uci (B, n_bits), ok (B,)); inverse of uci_encode."""
    if n_bits <= 11:
        folded = jnp.zeros((llr.shape[0], 32), llr.dtype)
        folded = folded.at[:, jnp.asarray(np.arange(E) % 32)].add(llr)
        # no CRC in the small block code: 'ok' is a correlation-confidence
        # threshold so callers can detect DTX / decode failure (conf is the
        # fraction of received LLR mass agreeing with the best codeword).
        uci, conf = small_block.decode(folded, n_bits, return_conf=True)
        return uci, conf > 0.5
    crc_name = "11" if n_bits >= 20 else "6"
    n_pc = 0 if n_bits >= 20 else 3
    K = n_bits + CRC_POLYS[crc_name][0]
    p = polar.polar_params(K=K, E=E, n_max=10, i_il=False, n_pc=n_pc, i_bil=True)
    return polar.decode_with_crc(p, llr, crc_name, list_size=list_size)


def pucch2_encode(cfg: Pucch2Config, uci: jnp.ndarray) -> jnp.ndarray:
    """(B, n_bits) -> (B, E) coded bits (small block or polar+CRC)."""
    return uci_encode(cfg.n_bits, cfg.E, uci)


def pucch2_tx(cfg: Pucch2Config, uci: jnp.ndarray) -> jnp.ndarray:
    """(B, n_bits) UCI -> (B, n_symbols, 12*n_prb) REs (data + DMRS)."""
    B = uci.shape[0]
    bits = pucch2_encode(cfg, uci)
    cinit = (cfg.rnti << 15) + cfg.n_id
    c = gold_sequence(jnp.uint32(cinit), cfg.E)
    syms = modulate(bits ^ c, 2).reshape(B, cfg.n_symbols, -1)
    data_sc, dmrs_sc = _pucch2_positions(cfg)
    grid = jnp.zeros((B, cfg.n_symbols, 12 * cfg.n_prb), jnp.complex64)
    grid = grid.at[:, :, jnp.asarray(data_sc)].set(syms)
    for s in range(cfg.n_symbols):
        cinit_d = refsig.dmrs_cinit(0, cfg.start_symbol + s, cfg.n_id0)
        pil = refsig.dmrs_sequence(cinit_d, len(dmrs_sc))
        grid = grid.at[:, s, jnp.asarray(dmrs_sc)].set(pil)
    return grid


def pucch2_rx(cfg: Pucch2Config, rx: jnp.ndarray, list_size: int = 8):
    """(B, n_rx, n_symbols, 12*n_prb) -> (uci (B, n_bits), ok (B,)).

    ok is a CRC flag for the polar path; for the small-block path it is
    always True (ML decoding has no CRC; DTX detection is metric-based).
    """
    data_sc, dmrs_sc = _pucch2_positions(cfg)
    hs = []
    for s in range(cfg.n_symbols):
        cinit_d = refsig.dmrs_cinit(0, cfg.start_symbol + s, cfg.n_id0)
        pil = refsig.dmrs_sequence(cinit_d, len(dmrs_sc))
        yp = rx[:, :, s][..., jnp.asarray(dmrs_sc)]
        hp = ls_estimate(yp, pil)                     # (B, R, P)
        # pilot smoothing (reference filt16 interpolation-LUT analog):
        # a raw single-pilot LS estimate costs ~3 dB at the F2 operating
        # points; pilots are 3 SCs apart so window 8 spans ~2 PRB
        from ..phy.channel_estimation import freq_average
        if len(dmrs_sc) > 2:
            hp = freq_average(hp, window=min(8, len(dmrs_sc)))
        # map each data SC to nearest pilot (pilots at 1,4,7,10 per PRB)
        nearest = np.abs(data_sc[None, :] - dmrs_sc[:, None]).argmin(axis=0)
        hs.append(hp[..., jnp.asarray(nearest)])
    h = jnp.stack(hs, axis=2)                         # (B, R, S, D)
    yd = rx[..., jnp.asarray(data_sc)]
    x = jnp.sum(jnp.conj(h) * yd, axis=1)
    mag = jnp.sum(jnp.abs(h) ** 2, axis=1)
    llr = llr_compute(x.reshape(x.shape[0], -1), mag.reshape(x.shape[0], -1), 2)
    cinit = (cfg.rnti << 15) + cfg.n_id
    llr = scramble_llrs(llr, jnp.uint32(cinit))
    return uci_decode(cfg.n_bits, cfg.E, llr, list_size=list_size)


# --------------------------------------------------------------------------
# Format 1 (TS 38.211 §6.3.2.4): sequence-modulated with time-domain OCC
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Pucch1Config:
    n_bits: int = 1             # 1 (BPSK) or 2 (QPSK)
    n_symbols: int = 14         # 4..14
    start_symbol: int = 0
    initial_cs: int = 0
    hopping_id: int = 0
    occ_index: int = 0          # time-domain OCC row
    slot: int = 0
    group_hopping: str = "neither"
    intra_slot_hopping: bool = False
    second_hop_prb: int = 0

    @property
    def n_data_syms(self) -> int:
        return self.n_symbols // 2

    @property
    def n_dmrs_syms(self) -> int:
        return self.n_symbols - self.n_data_syms

    def occ_blocks(self) -> list[tuple[list[int], list[int]]]:
        """[(dmrs_symbol_idxs, data_symbol_idxs)] per intra-slot hop —
        the time-domain OCC spans each hop separately (TS 38.211
        Table 6.3.2.4.1-1)."""
        n_first = self.n_symbols // 2 if self.intra_slot_hopping else self.n_symbols
        hops = [range(0, n_first), range(n_first, self.n_symbols)]
        out = []
        for h in hops:
            syms = list(h)
            if not syms:
                continue
            out.append(([s for s in syms if s % 2 == 0],
                        [s for s in syms if s % 2 == 1]))
        return out


def _occ_matrix(n: int) -> np.ndarray:
    """DFT orthogonal cover codes w_i(m) = exp(j 2 pi i m / n)."""
    i = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    return np.exp(2j * np.pi * i * m / n).astype(np.complex64)


def _f1_bases(cfg: Pucch1Config) -> np.ndarray:
    """(n_symbols, 12) per-symbol base sequence r_{u,alpha(l)} with the
    spec per-symbol alpha (m0 + n_cs(ns,l)) and per-hop group u."""
    out = np.empty((cfg.n_symbols, 12), np.complex64)
    for i, (u, ncs, _) in enumerate(_symbol_states(cfg)):
        out[i] = cyclic_shifted(u, (cfg.initial_cs + ncs) % 12)
    return out


def pucch1_tx(cfg: Pucch1Config, uci: jnp.ndarray) -> jnp.ndarray:
    """(B,) UCI values -> (B, n_symbols, 12) REs.

    DMRS on even symbol offsets, data on odd (38.211 Table 6.4.1.3.1.3-1
    structure); data symbol = d * r_alpha(l) * w_occ(m), OCC spanning
    each intra-slot hop separately.
    """
    bases = jnp.asarray(_f1_bases(cfg))
    # BPSK/QPSK point from UCI value
    table = jnp.asarray(np.array(
        [1 + 0j, -1 + 0j] if cfg.n_bits == 1 else
        [(1 + 1j), (1 - 1j), (-1 + 1j), (-1 - 1j)], dtype=np.complex64) / (np.sqrt(2) if cfg.n_bits == 2 else 1))
    d = jnp.take(table, uci)
    out = jnp.zeros((uci.shape[0], cfg.n_symbols, 12), jnp.complex64)
    for dmrs_syms, data_syms in cfg.occ_blocks():
        w_m = _occ_matrix(len(dmrs_syms))[cfg.occ_index]
        w_d = _occ_matrix(len(data_syms))[cfg.occ_index] if data_syms else []
        for mi, s in enumerate(dmrs_syms):
            out = out.at[:, s].set(bases[s][None] * w_m[mi])
        for di, s in enumerate(data_syms):
            out = out.at[:, s].set(d[:, None] * bases[s][None] * w_d[di])
    return out


def pucch1_rx(cfg: Pucch1Config, rx: jnp.ndarray):
    """(B, n_rx, n_symbols, 12) -> (uci (B,), metric).

    Coherent detection (nr_decode_pucch1 analog): channel from DMRS
    symbols (OCC-despread), data symbols OCC-despread and matched against
    the constellation; hops detected independently and combined.
    """
    bases_c = jnp.asarray(np.conj(_f1_bases(cfg)))
    corr = None
    for dmrs_syms, data_syms in cfg.occ_blocks():
        if not data_syms:
            continue
        w_m = np.conj(_occ_matrix(len(dmrs_syms))[cfg.occ_index])
        w_d = np.conj(_occ_matrix(len(data_syms))[cfg.occ_index])
        y_m = (rx[:, :, jnp.asarray(dmrs_syms)] * bases_c[jnp.asarray(dmrs_syms)]
               * jnp.asarray(w_m)[None, None, :, None])
        h = jnp.mean(y_m, axis=2)                       # (B, R, 12)
        y_d = (rx[:, :, jnp.asarray(data_syms)] * bases_c[jnp.asarray(data_syms)]
               * jnp.asarray(w_d)[None, None, :, None])
        z = jnp.mean(y_d, axis=2)                       # (B, R, 12)
        c = jnp.sum(jnp.conj(h) * z, axis=(1, 2))       # (B,)
        corr = c if corr is None else corr + c
    if cfg.n_bits == 1:
        uci = (corr.real < 0).astype(jnp.int32)
    else:
        b0 = (corr.real < 0).astype(jnp.int32)
        b1 = (corr.imag < 0).astype(jnp.int32)
        uci = 2 * b0 + b1
    return uci, jnp.abs(corr)


def hopped_group(hopping_id: int, slot: int, n_symbols_half: int = 2,
                 enabled: bool = True) -> int:
    """Group hopping (TS 38.211 §6.3.2.2.1): u = (f_gh + f_ss) mod 30.

    f_gh from the Gold sequence seeded floor(n_id/30), 8 bits per hop index
    (host-side; the hop index here is the slot number — intra-slot hopping
    off).  Returns the sequence group u for the slot.
    """
    f_ss = hopping_id % 30
    if not enabled:
        return f_ss
    # host-side gold bits (numpy path of the same generator)
    from ..phy.scrambling import _gold_tables
    import numpy as _np
    cinit = hopping_id // 30
    length = 8 * (2 * slot + 2)
    x1, apow = _gold_tables(length)
    s0 = _np.uint32(cinit)
    bits = ((_np.bitwise_count(apow & s0) & 1).astype(_np.int8)).reshape(-1)[:length]
    c = (x1[:length] ^ bits)
    seg = c[8 * 2 * slot: 8 * 2 * slot + 8]
    f_gh = int((seg * (1 << _np.arange(8))).sum() % 30)
    return (f_gh + f_ss) % 30


# --------------------------------------------------------------------------
# Formats 3 / 4 (TS 38.211 §6.3.2.6): DFT-s-OFDM UCI
# --------------------------------------------------------------------------

# DMRS symbol positions, TS 38.211 Table 6.4.1.3.3.2-1 (no intra-slot
# frequency hopping).  additional_dmrs applies for lengths >= 10.
_F34_DMRS = {
    4: [1], 5: [0, 3], 6: [1, 4], 7: [1, 4], 8: [1, 5], 9: [1, 6],
    10: [2, 7], 11: [2, 7], 12: [2, 8], 13: [2, 9], 14: [3, 10],
}
_F34_DMRS_ADD = {
    10: [1, 3, 6, 8], 11: [1, 3, 6, 9], 12: [1, 4, 7, 10],
    13: [1, 4, 7, 11], 14: [1, 5, 8, 12],
}

# Format 4 pre-DFT block-wise OCC, TS 38.211 Table 6.3.2.6.3-1/-2
# (phase pattern over the 12 subcarriers, blocks of Msc/SF)
def _f4_occ(sf: int, n: int) -> np.ndarray:
    k = np.arange(12)
    block = k // (12 // sf)
    return np.exp(2j * np.pi * n * block / sf).astype(np.complex64)

# Format 4 DMRS initial cyclic shift per OCC index
# (TS 38.211 Table 6.4.1.3.3.1-1)
_F4_DMRS_CS = {2: (0, 6), 4: (0, 6, 3, 9)}


@dataclasses.dataclass(frozen=True)
class Pucch34Config:
    fmt: int = 3                 # 3 or 4
    n_bits: int = 16
    n_prb: int = 1               # format 3: 1..16 (2^a 3^b 5^c); format 4: 1
    n_symbols: int = 14          # 4..14
    start_symbol: int = 0
    rnti: int = 0x1234
    n_id: int = 0
    hopping_id: int = 0
    pi2_bpsk: bool = False
    additional_dmrs: bool = False
    occ_len: int = 2             # format 4 only: 2 or 4
    occ_index: int = 0

    def __post_init__(self):
        if self.fmt == 4:
            assert self.n_prb == 1 and self.occ_len in (2, 4)

    @property
    def msc(self) -> int:
        return 12 * self.n_prb

    @property
    def dmrs_symbols(self) -> tuple:
        tab = _F34_DMRS_ADD if (self.additional_dmrs and self.n_symbols >= 10) \
            else _F34_DMRS
        return tuple(tab[self.n_symbols])

    @property
    def data_symbols(self) -> tuple:
        d = set(self.dmrs_symbols)
        return tuple(s for s in range(self.n_symbols) if s not in d)

    @property
    def qm(self) -> int:
        return 1 if self.pi2_bpsk else 2

    @property
    def E(self) -> int:
        sf = self.occ_len if self.fmt == 4 else 1
        return len(self.data_symbols) * (self.msc // sf) * self.qm


def _modulate_f34(cfg: Pucch34Config, bits: jnp.ndarray) -> jnp.ndarray:
    """QPSK or pi/2-BPSK (TS 38.211 §5.1.1) mapping of (B, E) bits."""
    if not cfg.pi2_bpsk:
        return modulate(bits, 2)
    B, E = bits.shape
    i = np.arange(E)
    rot = jnp.asarray(np.exp(1j * np.pi / 2 * (i % 2)).astype(np.complex64)
                      * np.complex64((1 + 1j) / 2 ** 0.5))
    return (1.0 - 2.0 * bits.astype(jnp.float32)) * rot[None, :]


def _f34_dmrs_seq(cfg: Pucch34Config) -> np.ndarray:
    """Low-PAPR DMRS base sequence for one symbol (group from hopping_id)."""
    u = cfg.hopping_id % 30
    if cfg.msc <= 24:
        base = cyclic_shifted(u, 0, cfg.msc)
    else:
        base = refsig.low_papr_sequence(u, 0, cfg.msc)
    if cfg.fmt == 4:
        m0 = _F4_DMRS_CS[cfg.occ_len][cfg.occ_index]
        n = np.arange(cfg.msc)
        base = base * np.exp(2j * np.pi * m0 * n / 12)
    return base.astype(np.complex64)


def pucch34_tx(cfg: Pucch34Config, uci: jnp.ndarray) -> jnp.ndarray:
    """(B, n_bits) UCI -> (B, n_symbols, msc) freq-domain REs.

    Reference: nr_generate_pucch3_4 (pucch_nr.c:1319) — encode, scramble,
    modulate, (F4) block-OCC spread, DFT, plus low-PAPR DMRS symbols.
    """
    from ..phy.transform_precoding import dft_spread

    B = uci.shape[0]
    bits = uci_encode(cfg.n_bits, cfg.E, uci)
    cinit = (cfg.rnti << 15) + cfg.n_id
    c = gold_sequence(jnp.uint32(cinit), cfg.E)
    d = _modulate_f34(cfg, bits ^ c)                     # (B, n_data*msc/sf)
    n_data = len(cfg.data_symbols)
    if cfg.fmt == 4:
        sf = cfg.occ_len
        w = jnp.asarray(_f4_occ(sf, cfg.occ_index))
        d = d.reshape(B, n_data, cfg.msc // sf)
        d = jnp.tile(d, (1, 1, sf)) * w[None, None, :]   # block-wise spread
        d = d.reshape(B, n_data * cfg.msc)
    y = dft_spread(d, cfg.msc).reshape(B, n_data, cfg.msc)
    pil = jnp.asarray(_f34_dmrs_seq(cfg))
    grid = jnp.zeros((B, cfg.n_symbols, cfg.msc), jnp.complex64)
    grid = grid.at[:, jnp.asarray(np.array(cfg.data_symbols))].set(y)
    grid = grid.at[:, jnp.asarray(np.array(cfg.dmrs_symbols))].set(pil[None, None, :])
    return grid


def pucch34_rx(cfg: Pucch34Config, rx: jnp.ndarray, list_size: int = 8):
    """(B, n_rx, n_symbols, msc) -> (uci (B, n_bits), ok (B,)).

    LS channel estimate averaged over DMRS symbols, MRC matched filter,
    shared IDFT despreader (per-RE ZF + harmonic-mean gain), (F4) OCC
    despread/fold, max-log LLRs, descramble, small-block/polar decode.
    """
    from ..phy.transform_precoding import idft_despread

    B = rx.shape[0]
    pil = jnp.asarray(_f34_dmrs_seq(cfg))
    yp = rx[:, :, jnp.asarray(np.array(cfg.dmrs_symbols))]     # (B,R,Nd,msc)
    h = jnp.mean(yp * jnp.conj(pil)[None, None, None, :], axis=2)  # (B,R,msc)
    if cfg.fmt == 4:
        # users multiplexed on the PRB sit at distinct DMRS cyclic shifts =
        # distinct delay taps; window the delay-domain estimate around this
        # user's own tap (the cyclic-shift separation receiver of
        # nr_decode_pucch... delay filtering, cf. pucch_rx.c channel est)
        sep = 12 // len(_F4_DMRS_CS[cfg.occ_len])
        half = (sep - 1) // 2
        d = np.arange(12)
        mask = (np.minimum(d, 12 - d) <= half).astype(np.float32)
        taps = jnp.fft.ifft(h, axis=-1) * jnp.asarray(mask)[None, None, :]
        h = jnp.fft.fft(taps, axis=-1).astype(jnp.complex64)
    yd = rx[:, :, jnp.asarray(np.array(cfg.data_symbols))]     # (B,R,S,msc)
    x = jnp.sum(jnp.conj(h)[:, :, None, :] * yd, axis=1)       # (B,S,msc)
    mag = jnp.broadcast_to(
        jnp.sum(jnp.abs(h) ** 2, axis=1)[:, None, :], x.shape)
    n_data = len(cfg.data_symbols)
    d, mag_eff = idft_despread(
        x.reshape(B, -1), mag.reshape(B, -1), cfg.msc)
    if cfg.fmt == 4:
        sf = cfg.occ_len
        w = jnp.asarray(_f4_occ(sf, cfg.occ_index))
        d = (d.reshape(B, n_data, sf, cfg.msc // sf)
             * jnp.conj(w).reshape(1, 1, sf, cfg.msc // sf))
        d = jnp.sum(d, axis=2).reshape(B, -1)
        mag_eff = jnp.sum(
            mag_eff.reshape(B, n_data, sf, cfg.msc // sf), axis=2).reshape(B, -1)
    if cfg.pi2_bpsk:
        i = np.arange(d.shape[-1])
        derot = jnp.asarray(np.exp(-1j * np.pi / 2 * (i % 2)).astype(np.complex64)
                            * np.complex64((1 - 1j) / 2 ** 0.5))
        llr = (d * derot[None, :]).real.astype(jnp.float32)
    else:
        llr = llr_compute(d, mag_eff, 2)
    cinit = (cfg.rnti << 15) + cfg.n_id
    llr = scramble_llrs(llr.reshape(B, -1), jnp.uint32(cinit))
    return uci_decode(cfg.n_bits, cfg.E, llr, list_size=list_size)
