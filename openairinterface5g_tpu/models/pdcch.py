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
class CoresetConfig:
    """CORESET geometry + CCE-to-REG mapping (TS 38.211 §7.3.2.2)."""

    n_prb: int = 48
    duration: int = 1            # CORESET symbols (1..3); grid fns use 1
    interleaved: bool = False
    reg_bundle_size: int = 6     # L in {2, 6} (dur 1) / {duration, 6}
    interleaver_rows: int = 2    # R in {2, 3, 6}
    shift: int = 0               # n_shift (cell id / configured)

    @property
    def n_reg(self) -> int:
        return self.n_prb * self.duration

    @property
    def n_cce(self) -> int:
        return self.n_reg // 6

    def bundle_perm(self) -> np.ndarray:
        """f(x): REG-bundle interleaver (38.211 7.3.2.2)."""
        L = self.reg_bundle_size if self.interleaved else 6
        n_bun = self.n_reg // L
        if not self.interleaved:
            return np.arange(n_bun)
        R = self.interleaver_rows
        assert n_bun % R == 0, "C = N_bundle/R must be integer"
        C = n_bun // R
        f = np.empty(n_bun, dtype=np.int64)
        for x in range(n_bun):
            c, r = divmod(x, R)
            f[x] = (r * C + c + self.shift) % n_bun
        return f

    def cce_prbs(self, cces) -> np.ndarray:
        """Sorted PRB indices occupied by the given CCEs (duration 1)."""
        assert self.duration == 1, "grid mapping implemented for 1-symbol CORESET"
        L = self.reg_bundle_size if self.interleaved else 6
        f = self.bundle_perm()
        per_cce = 6 // L
        prbs = []
        for cce in cces:
            for b in range(per_cce):
                fb = int(f[cce * per_cce + b])
                prbs.extend(range(fb * L, fb * L + L))  # REG==PRB at dur 1
        return np.array(sorted(prbs), dtype=np.int64)


def search_space_candidates(cs: CoresetConfig, al: int, n_candidates: int,
                            rnti: int = 0, slot: int = 0, css: bool = True,
                            p: int = 0) -> list[int]:
    """Candidate CCE start indices (TS 38.213 §10.1).

    CSS: Y = 0; USS: Y_{p,slot} by the A_p-multiplicative recursion seeded
    with the RNTI.  Returns n_candidates starts (may repeat if the CORESET
    is small).
    """
    n_cce = cs.n_cce
    if css:
        y = 0
    else:
        A = (39827, 39829, 39839)[p % 3]
        D = 65537
        y = rnti
        for _ in range(slot + 1):
            y = (A * y) % D
    out = []
    for m in range(n_candidates):
        start = al * ((y + (m * n_cce) // (al * n_candidates)) % (n_cce // al))
        out.append(start)
    return out


@dataclasses.dataclass(frozen=True)
class DciConfig:
    A: int = 39                  # DCI payload bits (format 1_1-ish)
    aggregation_level: int = 4   # 1/2/4/8/16 CCEs
    rnti: int = 0x1234
    n_id: int = 0                # pdcch DMRS scrambling id
    start_symbol: int = 0
    coreset_prb: int = 48        # CORESET width (6 PRB per CCE, 1-symbol)
    coreset: CoresetConfig | None = None  # full geometry (defaults: above)
    cce_index: int = 0           # first CCE of this candidate

    @property
    def cs(self) -> CoresetConfig:
        return self.coreset or CoresetConfig(n_prb=self.coreset_prb)

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


# --- CORESET RE mapping (1-symbol; interleaved or not) ----------------------

def _pdcch_positions(cfg: DciConfig):
    """Data + DMRS subcarrier indices within the CORESET for this
    candidate's CCEs (cce_index .. cce_index+AL-1), after CCE-to-REG
    (bundle-interleaved) mapping.

    REG = 1 PRB x 1 symbol; DMRS on SCs 1,5,9 of each PRB (38.211 7.4.1.3);
    symbols map in increasing subcarrier order over the assigned REGs.
    """
    prbs = cfg.cs.cce_prbs(range(cfg.cce_index,
                                 cfg.cce_index + cfg.aggregation_level))
    sc = (prbs[:, None] * 12 + np.arange(12)[None, :]).reshape(-1)
    dmrs = sc[sc % 4 == 1]
    data = sc[sc % 4 != 1]
    return data.astype(np.int32), dmrs.astype(np.int32), len(prbs)


def pdcch_tx_grid(cfg: DciConfig, payload: jnp.ndarray, slot: int = 0) -> jnp.ndarray:
    """(B, A) DCI -> (B, 12*coreset_prb) REs for the CORESET symbol."""
    B = payload.shape[0]
    bits = dci_encode(cfg, payload)
    # codeword scrambling (38.211 7.3.2.3): cinit = (rnti<<16 + n_id) mod 2^31
    cinit = ((cfg.rnti << 16) + cfg.n_id) % (1 << 31)
    c = gold_sequence(jnp.uint32(cinit), cfg.E)
    syms = modulate(bits ^ c, 2)
    data_sc, dmrs_sc, n_prb = _pdcch_positions(cfg)
    out = jnp.zeros((B, 12 * cfg.cs.n_prb), jnp.complex64)
    out = out.at[:, jnp.asarray(data_sc)].set(syms)
    # PDCCH DMRS (38.211 7.4.1.3): the Gold sequence spans the CORESET;
    # pilot at DMRS subcarrier k is element k//4 (3 pilots per PRB), so
    # interleaved (non-contiguous) candidates index it sparsely
    cinit_d = refsig.dmrs_cinit(slot, cfg.start_symbol, cfg.n_id)
    pil_full = refsig.dmrs_sequence(cinit_d, 3 * cfg.cs.n_prb)
    out = out.at[:, jnp.asarray(dmrs_sc)].set(pil_full[jnp.asarray(dmrs_sc // 4)])
    return out


def pdcch_rx(cfg: DciConfig, rx_res: jnp.ndarray, slot: int = 0, list_size: int = 8):
    """(B, n_rx, 12*coreset_prb) CORESET symbol REs -> DCI decode.

    LS estimate on PDCCH DMRS + MRC + QPSK LLRs + descramble + SCL.
    """
    data_sc, dmrs_sc, n_prb = _pdcch_positions(cfg)
    cinit_d = refsig.dmrs_cinit(slot, cfg.start_symbol, cfg.n_id)
    pil = refsig.dmrs_sequence(cinit_d, 3 * cfg.cs.n_prb)[jnp.asarray(dmrs_sc // 4)]
    yp = rx_res[..., jnp.asarray(dmrs_sc)]
    hp = ls_estimate(yp, pil)
    # linear interpolation between the bracketing pilots of each PRB
    # (pilots at SCs +1/+5/+9; edge SCs hold) — the reference's filt16
    # interpolation-LUT behavior, per-PRB so interleaved (non-contiguous)
    # candidates stay correct.  Replaces the round-3 nearest-pilot map.
    prb_pos = {p: i for i, p in enumerate(sorted(set(data_sc // 12)))}
    lo = np.empty(len(data_sc), np.int64)
    hi = np.empty(len(data_sc), np.int64)
    w = np.empty(len(data_sc), np.float32)
    for i, d in enumerate(data_sc):
        base = 3 * prb_pos[d // 12]
        k = d % 12
        if k <= 1:
            lo[i] = hi[i] = base
            w[i] = 0.0
        elif k >= 9:
            lo[i] = hi[i] = base + 2
            w[i] = 0.0
        else:
            j = (k - 1) // 4             # bracketing pilot pair (1,5)/(5,9)
            lo[i], hi[i] = base + j, base + j + 1
            w[i] = ((k - 1) % 4) / 4.0
    wj = jnp.asarray(w)
    h = (1.0 - wj) * hp[..., jnp.asarray(lo)] + wj * hp[..., jnp.asarray(hi)]
    yd = rx_res[..., jnp.asarray(data_sc)]
    x = jnp.sum(jnp.conj(h) * yd, axis=1)
    mag = jnp.sum(jnp.abs(h) ** 2, axis=1)
    llr = llr_compute(x, mag, 2)
    cinit = ((cfg.rnti << 16) + cfg.n_id) % (1 << 31)
    llr = scramble_llrs(llr, jnp.uint32(cinit))
    return dci_decode(cfg, llr, list_size=list_size)


def blind_search(rx_res: jnp.ndarray, A: int, rnti: int,
                 aggregation_levels=(1, 2, 4, 8), n_id: int = 0,
                 coreset_prb: int = 48, slot: int = 0, list_size: int = 8,
                 coreset: CoresetConfig | None = None,
                 candidates_per_al=(6, 6, 2, 2), css: bool = True,
                 start_symbol: int = 0):
    """UE-side DCI blind decode over (AL, candidate) hypotheses.

    Mirrors nr_dci_decoding_procedure (dci_nr.c:768): for each
    aggregation level, try the search-space candidates (TS 38.213 §10.1
    CCE starts — CSS Y=0 or USS hashed by RNTI), return the first
    CRC-passing payload.  All hypotheses run batched; the RNTI-masked
    CRC is the detector.  Returns (payload (B, A), found (B,), al (B,)).
    """
    cs = coreset or CoresetConfig(n_prb=coreset_prb)
    B = rx_res.shape[0]
    best_payload = jnp.zeros((B, A), jnp.int8)
    found = jnp.zeros((B,), bool)
    al_out = jnp.zeros((B,), jnp.int32)
    for ai, al in enumerate(aggregation_levels):
        if 6 * al > cs.n_reg:
            continue
        n_cand = candidates_per_al[ai] if ai < len(candidates_per_al) else 1
        n_cand = min(n_cand, cs.n_cce // al)
        tried = set()
        for cce0 in search_space_candidates(cs, al, n_cand, rnti=rnti,
                                            slot=slot, css=css):
            if cce0 in tried:
                continue
            tried.add(cce0)
            cfg = DciConfig(A=A, aggregation_level=al, rnti=rnti, n_id=n_id,
                            coreset=cs, cce_index=cce0,
                            start_symbol=start_symbol)
            bits, ok = pdcch_rx(cfg, rx_res, slot=slot, list_size=list_size)
            take = ok & ~found
            best_payload = jnp.where(take[:, None], bits, best_payload)
            al_out = jnp.where(take, al, al_out)
            found = found | ok
    return best_payload, found, al_out
