"""PBCH / SSB chain (P20/P29 analog): PSS/SSS/PBCH generation + UE RX.

Reference anchors: TX nr_generate_pbch (openair1/PHY/NR_TRANSPORT/
nr_pbch.c:223) + nr_common_signal_procedures (SCHED_NR/
phy_procedures_nr_gNB.c:48); RX nr_rx_pbch (openair1/PHY/NR_UE_TRANSPORT/
nr_pbch.c:470).

The SSB is a static 240-subcarrier x 4-symbol tile; generation and
reception are pure tensor ops (mapping per TS 38.211 §7.4.3.1).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..coding import polar
from ..coding.crc import crc_attach
from ..phy import refsig
from ..phy.channel_estimation import ls_estimate
from ..phy.llr import llrs as llr_compute
from ..phy.modulation import modulate
from ..phy.scrambling import gold_sequence

# TS 38.212 §7.1.1 PBCH payload interleaving pattern G(j)
PBCH_PAYLOAD_INTERLEAVER = np.array(
    [16, 23, 18, 17, 8, 30, 10, 6, 24, 7, 0, 5, 3, 2, 1, 4,
     9, 11, 12, 13, 14, 15, 19, 20, 21, 22, 25, 26, 27, 28, 29, 31],
    dtype=np.int32,
)


def _payload_ilv() -> np.ndarray:
    """ILV[src] = destination bit: the §7.1.1 class-based interleaver
    (j_SFN=0, j_HRF=10, j_SSB=11, j_other=14 walk G(j); reference twin
    nr_init_pbch_interleaver, nr_pbch.c:204)."""
    G = PBCH_PAYLOAD_INTERLEAVER
    ilv = np.zeros(32, np.int64)
    j_sfn, j_hrf, j_ssb, j_other = 0, 10, 11, 14
    for i in range(32):
        if i == 0:                      # choice bit
            ilv[i] = G[j_other]; j_other += 1
        elif i < 7:                     # 6 SFN MSBs
            ilv[i] = G[j_sfn]; j_sfn += 1
        elif i < 24:                    # other MIB bits
            ilv[i] = G[j_other]; j_other += 1
        elif i < 28:                    # 4 SFN LSBs
            ilv[i] = G[j_sfn]; j_sfn += 1
        elif i == 28:                   # half-frame bit
            ilv[i] = G[j_hrf]
        else:                           # SSB index / k_SSB MSB bits
            ilv[i] = G[j_ssb]; j_ssb += 1
    return ilv


_ILV = _payload_ilv()                       # src -> dest
_ILV_INV = np.argsort(_ILV)                 # dest -> src (gather indices)
# interleaved-domain positions exempt from 1st-level scrambling
# (HRF + 2nd/3rd SFN LSBs; +3 SSB-index bits at Lmax=64) — the reference's
# unscrambling_mask 0x1000041 / 0x100006D (nr_pbch.c:292)
_EXEMPT = {8: (0, 6, 24), 64: (0, 2, 3, 5, 6, 24)}

A_PBCH = 32           # payload bits
E_PBCH = 864
K_PBCH = 56           # A + CRC24
N_SSB_SC = 240


@dataclasses.dataclass(frozen=True)
class PbchConfig:
    n_id: int = 0           # physical cell id (0..1007)
    i_ssb: int = 0          # SSB (candidate) index, 0..Lmax-1
    n_hf: int = 0
    lmax: int = 8           # max SSBs per burst (4 / 8 / 64)

    @property
    def v(self) -> int:
        return self.n_id % 4

    @property
    def i_ssb_eff(self) -> int:
        """DMRS scrambling index ī (TS 38.211 7.4.1.4.1): Lmax=4 uses the
        2 LSBs + 4*n_hf; Lmax>4 the 3 LSBs of the SSB index."""
        if self.lmax == 4:
            return (self.i_ssb & 3) + 4 * self.n_hf
        return self.i_ssb & 7

    @property
    def v2(self) -> int:
        """2nd-level scrambling shift (38.211 7.3.3.1): 2 or 3 SSB-index
        LSBs depending on Lmax."""
        return self.i_ssb & 3 if self.lmax == 4 else self.i_ssb & 7


def _polar_params():
    return polar.polar_params(K=K_PBCH, E=E_PBCH, n_max=9, i_il=True)


def pbch_dmrs(cfg: PbchConfig) -> jnp.ndarray:
    """(144,) QPSK DMRS sequence (TS 38.211 §7.4.1.4)."""
    cinit = ((1 << 11) * (cfg.i_ssb_eff + 1) * (cfg.n_id // 4 + 1)
             + (1 << 6) * (cfg.i_ssb_eff + 1) + (cfg.n_id % 4)) % (1 << 31)
    return refsig.dmrs_sequence(cinit, 144)


def _dmrs_positions(cfg: PbchConfig):
    """(sym, sc) positions of the 144 PBCH DMRS REs within the SSB tile."""
    v = cfg.v
    pos = []
    for k in range(0, 240, 4):
        pos.append((1, v + k))
    for k in range(0, 48, 4):
        pos.append((2, v + k))
    for k in range(192, 240, 4):
        pos.append((2, v + k))
    for k in range(0, 240, 4):
        pos.append((3, v + k))
    return np.array(pos, dtype=np.int32)


def _data_positions(cfg: PbchConfig):
    """(sym, sc) positions of the 432 PBCH data REs (TS 38.211 7.4.3.1-1)."""
    v = cfg.v
    pos = []
    for k in range(240):
        if k % 4 != v:
            pos.append((1, k))
    for k in list(range(48)) + list(range(192, 240)):
        if k % 4 != v:
            pos.append((2, k))
    for k in range(240):
        if k % 4 != v:
            pos.append((3, k))
    return np.array(pos, dtype=np.int32)


def _first_level_masks(lmax: int):
    exempt = _EXEMPT[64 if lmax == 64 else 8]
    scr_pos = np.array([i for i in range(32) if i not in exempt], np.int64)
    return scr_pos, len(scr_pos)


def _first_level_sequence(cfg: PbchConfig, a_ilv: jnp.ndarray) -> jnp.ndarray:
    """(B, 32) interleaved payload -> (B, 32) scrambling bits s (0 at the
    exempt positions).  38.211 §7.3.3.1 1st-level scrambling: Gold seeded
    by the cell id, offset v*M where v = 2*(3rd SFN LSB) + (2nd SFN LSB)
    — both readable from the (unscrambled) interleaved payload, so the
    same function serves scramble and descramble.
    """
    scr_pos, M = _first_level_masks(cfg.lmax)
    v = 2 * a_ilv[..., 6] + a_ilv[..., 24]              # (B,) in 0..3
    c = gold_sequence(jnp.uint32(cfg.n_id), 4 * M)      # static length
    idx = v[..., None].astype(jnp.int32) * M + jnp.arange(M, dtype=jnp.int32)
    s_bits = jnp.take(c, idx, axis=-1).astype(jnp.int8)  # (B, M)
    s = jnp.zeros(a_ilv.shape, jnp.int8)
    return s.at[..., jnp.asarray(scr_pos)].set(s_bits)


def pbch_encode(cfg: PbchConfig, payload: jnp.ndarray) -> jnp.ndarray:
    """(B, 32) payload (MIB + extra bits, see mib_payload) -> (B, 864)
    scrambled coded bits.

    Spec chain (TS 38.212 §7.1): class-based payload interleaving,
    SFN-seeded 1st-level scrambling (v from the SFN's 2nd/3rd LSBs,
    HRF/SFN-v/SSB-index bits exempt), CRC24C, polar(K=56, E=864),
    then 2nd-level scrambling (38.211 §7.3.3.1, shift v2 = SSB-index
    LSBs).  Reference twin nr_generate_pbch (nr_pbch.c:223).
    """
    p = _polar_params()
    a_ilv = jnp.take(payload, jnp.asarray(_ILV_INV), axis=-1)
    a_prime = a_ilv ^ _first_level_sequence(cfg, a_ilv)
    with_crc = crc_attach(a_prime.astype(jnp.int8), "24C")
    e = polar.encode(p, with_crc)
    v = cfg.v2
    c = gold_sequence(jnp.uint32(cfg.n_id), (v + 1) * E_PBCH)[v * E_PBCH:]
    return e ^ c


def pbch_decode(cfg: PbchConfig, llr_e: jnp.ndarray, list_size: int = 8):
    """(B, 864) LLRs -> ((B, 32) payload, ok (B,)).

    Inverts pbch_encode: 2nd-level descramble, SCL decode + CRC24C,
    1st-level descramble (v recovered from the exempt SFN bits), payload
    deinterleave.
    """
    p = _polar_params()
    v = cfg.v2
    c = gold_sequence(jnp.uint32(cfg.n_id), (v + 1) * E_PBCH)[v * E_PBCH:]
    llr_d = llr_e * (1.0 - 2.0 * c.astype(llr_e.dtype))
    a_prime, ok = polar.decode_with_crc(p, llr_d, "24C", list_size=list_size)
    a_ilv = a_prime ^ _first_level_sequence(cfg, a_prime)
    return jnp.take(a_ilv, jnp.asarray(_ILV), axis=-1), ok


def ssb_generate(cfg: PbchConfig, payload: jnp.ndarray) -> jnp.ndarray:
    """(B, 32) payload -> (B, 4, 240) SSB tile (PSS+SSS+PBCH+DMRS)."""
    B = payload.shape[0]
    grid = jnp.zeros((B, 4, N_SSB_SC), jnp.complex64)
    pss = jnp.asarray(refsig.pss_sequence(cfg.n_id % 3), dtype=jnp.complex64)
    sss = jnp.asarray(refsig.sss_sequence(cfg.n_id // 3, cfg.n_id % 3), dtype=jnp.complex64)
    grid = grid.at[:, 0, 56:183].set(pss)
    grid = grid.at[:, 2, 56:183].set(sss)
    scr = pbch_encode(cfg, payload)
    syms = modulate(scr, 2)                          # (B, 432) QPSK
    dpos = _data_positions(cfg)
    grid = grid.at[:, jnp.asarray(dpos[:, 0]), jnp.asarray(dpos[:, 1])].set(syms)
    dmrs = pbch_dmrs(cfg)
    mpos = _dmrs_positions(cfg)
    grid = grid.at[:, jnp.asarray(mpos[:, 0]), jnp.asarray(mpos[:, 1])].set(dmrs)
    return grid


def ssb_receive(cfg: PbchConfig, rx_tile: jnp.ndarray, list_size: int = 8):
    """(B, n_rx, 4, 240) received SSB tile -> decoded payload + CRC flag.

    DMRS LS estimation + comb-4 nearest interpolation + MRC + QPSK LLR +
    polar SCL decode.
    """
    mpos = _dmrs_positions(cfg)
    dpos = _data_positions(cfg)
    dmrs = pbch_dmrs(cfg)
    yp = rx_tile[:, :, jnp.asarray(mpos[:, 0]), jnp.asarray(mpos[:, 1])]
    hp = ls_estimate(yp, dmrs)                       # (B, R, 144)
    # block-fading assumption over the 4-symbol SSB: average the LS
    # estimates over the symbols sharing each comb-4 SC position (syms
    # 1/3 carry all 60, sym 2 the outer 24), then smooth in frequency —
    # the combined time+filt16a averaging of nr_dl_channel_estimation.c
    from ..phy.channel_estimation import freq_average
    pos_of = {}
    for i, (s, k) in enumerate(np.asarray(mpos)):
        pos_of.setdefault(int(k), []).append(i)
    scs = sorted(pos_of)
    sums = jnp.stack(
        [jnp.mean(hp[..., jnp.asarray(pos_of[k])], axis=-1) for k in scs], axis=-1)
    h_sc = freq_average(sums, window=16)             # (B, R, 60)
    # map each data RE to its nearest comb-4 SC estimate
    sc_arr = np.array(scs)
    h_map = np.abs(dpos[:, 1][None, :] - sc_arr[:, None]).argmin(axis=0)
    h_data = h_sc[..., jnp.asarray(h_map)]           # (B, R, 432)
    yd = rx_tile[:, :, jnp.asarray(dpos[:, 0]), jnp.asarray(dpos[:, 1])]
    x = jnp.sum(jnp.conj(h_data) * yd, axis=1)       # MRC over rx ants
    mag = jnp.sum(jnp.abs(h_data) ** 2, axis=1)
    llr_e = llr_compute(x, mag, 2)
    return pbch_decode(cfg, llr_e, list_size=list_size)


# --------------------------------------------------------------------------
# MIB payload pack/unpack (TS 38.331 MIB + TS 38.212 §7.1.1 extra bits)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Mib:
    """BCCH-BCH MIB fields (TS 38.331).  sfn/hrf/ssb index live outside."""

    scs_common: int = 1          # 0: 15/60 kHz, 1: 30/120 kHz
    k_ssb: int = 0               # ssb-SubcarrierOffset, 5 bits (MSB via extra)
    dmrs_typea_pos: int = 0      # 0: pos2, 1: pos3
    pdcch_config_sib1: int = 0   # 8 bits
    cell_barred: int = 0
    intra_freq_reselection: int = 0


def mib_payload(mib: Mib, sfn: int, hrf: int = 0, ssb_idx: int = 0,
                lmax: int = 8) -> np.ndarray:
    """-> (32,) int8 PBCH payload a_0..a_31 (pre-interleave order).

    Bit layout mirrors the reference's pbch_a assembly
    (nr_generate_pbch, nr_pbch.c:248-273): 24 MIB bits MSB-first
    (choice bit, 6 SFN MSBs, scs, 4 k_SSB LSBs, dmrs pos, pdcch cfg,
    barred, reselection, spare) then 4 SFN LSBs, HRF, and 3 SSB-index
    MSBs (Lmax=64) / k_SSB MSB (else).
    """
    a = np.zeros(32, np.int8)
    # a[0] = choice bit (0)
    for i in range(6):
        a[1 + i] = (sfn >> (9 - i)) & 1
    a[7] = mib.scs_common & 1
    for i in range(4):
        a[8 + i] = (mib.k_ssb >> (3 - i)) & 1
    a[12] = mib.dmrs_typea_pos & 1
    for i in range(8):
        a[13 + i] = (mib.pdcch_config_sib1 >> (7 - i)) & 1
    a[21] = mib.cell_barred & 1
    a[22] = mib.intra_freq_reselection & 1
    # a[23] = spare
    for i in range(4):
        a[24 + i] = (sfn >> (3 - i)) & 1
    a[28] = hrf & 1
    if lmax == 64:
        for i in range(3):
            a[29 + i] = (ssb_idx >> (5 - i)) & 1
    else:
        a[29] = (mib.k_ssb >> 4) & 1
    return a


def mib_unpack(payload, lmax: int = 8) -> dict:
    """(…, 32) decoded payload -> dict of MIB + timing fields (arrays)."""
    a = jnp.asarray(payload).astype(jnp.int32)

    def num(sl):
        bits = a[..., sl]
        w = 2 ** jnp.arange(bits.shape[-1] - 1, -1, -1, dtype=jnp.int32)
        return jnp.sum(bits * w, axis=-1)

    out = {
        "sfn": num(slice(1, 7)) * 16 + num(slice(24, 28)),
        "scs_common": a[..., 7],
        "dmrs_typea_pos": a[..., 12],
        "pdcch_config_sib1": num(slice(13, 21)),
        "cell_barred": a[..., 21],
        "intra_freq_reselection": a[..., 22],
        "hrf": a[..., 28],
    }
    if lmax == 64:
        out["k_ssb"] = num(slice(8, 12))
        out["ssb_idx_msbs"] = num(slice(29, 32)) * 8  # add PBCH DMRS ī for full idx
    else:
        out["k_ssb"] = a[..., 29] * 16 + num(slice(8, 12))
    return out


# --------------------------------------------------------------------------
# SSB burst timing (TS 38.213 §4.1 cases A-E)
# --------------------------------------------------------------------------

def ssb_first_symbols(case: str, lmax: int) -> np.ndarray:
    """Candidate SSB first-symbol indices (within the half frame, counted
    in the SSB numerology's symbols) for burst case A..E."""
    case = case.upper()
    if case in ("A", "C"):
        base, step = np.array([2, 8]), 14
        n = {4: range(2), 8: range(4)}[lmax]
    elif case == "B":
        base, step = np.array([4, 8, 16, 20]), 28
        n = {4: range(1), 8: range(2)}[lmax]
    elif case == "D":
        base, step = np.array([4, 8, 16, 20]), 28
        assert lmax == 64
        n = [i for i in range(19) if i % 5 != 4]     # 0..18 minus 4,9,14
    elif case == "E":
        base, step = np.array([8, 12, 16, 20, 32, 36, 40, 44]), 56
        assert lmax == 64
        n = [i for i in range(9) if i != 4]
    else:
        raise ValueError(f"unknown SSB case {case!r}")
    out = np.concatenate([base + step * i for i in n])
    assert len(out) == lmax, (case, lmax, len(out))
    return out.astype(np.int64)


def ssb_in_slot(case: str, lmax: int, slot: int,
                symbols_per_slot: int = 14) -> list[tuple[int, int]]:
    """[(ssb_idx, start_symbol_in_slot)] for SSB candidates landing in
    `slot` (slot counted in the SSB numerology)."""
    firsts = ssb_first_symbols(case, lmax)
    lo, hi = slot * symbols_per_slot, (slot + 1) * symbols_per_slot
    return [(int(i), int(s - lo)) for i, s in enumerate(firsts)
            if lo <= s and s + 4 <= hi]


def _nearest_pilot_map(cfg: PbchConfig) -> np.ndarray:
    """For each PBCH data RE, index of the nearest DMRS RE (same symbol)."""
    mpos = _dmrs_positions(cfg)
    dpos = _data_positions(cfg)
    out = np.empty(len(dpos), dtype=np.int32)
    for i, (s, k) in enumerate(dpos):
        cand = np.nonzero(mpos[:, 0] == s)[0]
        j = cand[np.argmin(np.abs(mpos[cand, 1] - k))]
        out[i] = j
    return out
