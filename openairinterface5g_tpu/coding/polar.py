"""NR polar coding (TS 38.212 §5.3.1 / §5.4.1): encode + CRC-aided SCL decode.

Design vs reference (openair1/PHY/CODING/nrPolar_tools/):

* Parameters (frozen set, rate-matching pattern, interleavers) are built
  host-side in numpy per static (K, E, n_max, IL, n_PC) — the analog of
  nr_polar_init.c's cached polarParams list, but as plain index tensors.
* Encoding is the log2(N)-stage butterfly XOR on (batch, N) int8 tensors
  (polar_transform) instead of nr_polar_encoder.c:488's 64-bit word tricks;
  XLA vectorizes the stages across the batch dim.
* Decoding is successive-cancellation list (SCL) with the recursion over
  tree levels unrolled at trace time.  The list dim is a tensor axis of
  size L, so all L paths advance in lockstep on the VPU; rate-0 (all
  frozen) subtrees collapse to a single metric update.  Equivalent of
  polar_decoder_int16 (nr_polar_decoder.c:619) with CRC path selection.

Bit/LLR conventions: bits in {0,1}; LLR > 0 means bit==0.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tables import polar_reliability_sequence
from .crc import crc_compute

# TS 38.212 Table 5.4.1.1-1 sub-block interleaver pattern
SUBBLOCK_PERM = np.array(
    [0, 1, 2, 4, 3, 5, 6, 7, 8, 16, 9, 17, 10, 18, 11, 19,
     12, 20, 13, 21, 14, 22, 15, 23, 24, 25, 26, 28, 27, 29, 30, 31],
    dtype=np.int32,
)

# TS 38.212 Table 5.3.1.1-1 interleaving pattern Pi_IL_max (K_IL_max = 164)
_PI_IL_MAX = np.array(
    [0, 2, 4, 7, 9, 14, 19, 20, 24, 25, 26, 28, 31, 34,
     42, 45, 49, 50, 51, 53, 54, 56, 58, 59, 61, 62, 65, 66,
     67, 69, 70, 71, 72, 76, 77, 81, 82, 83, 87, 88, 89, 91,
     93, 95, 98, 101, 104, 106, 108, 110, 111, 113, 115, 118, 119, 120,
     122, 123, 126, 127, 129, 132, 134, 138, 139, 140, 1, 3, 5, 8,
     10, 15, 21, 27, 29, 32, 35, 43, 46, 52, 55, 57, 60, 63,
     68, 73, 78, 84, 90, 92, 94, 96, 99, 102, 105, 107, 109, 112,
     114, 116, 121, 124, 128, 130, 133, 135, 141, 6, 11, 16, 22, 30,
     33, 36, 44, 47, 64, 74, 79, 85, 97, 100, 103, 117, 125, 131,
     136, 142, 12, 17, 23, 37, 48, 75, 80, 86, 137, 143, 13, 18,
     38, 144, 39, 145, 40, 146, 41, 147, 148, 149, 150, 151, 152, 153,
     154, 155, 156, 157, 158, 159, 160, 161, 162, 163],
    dtype=np.int32,
)


@dataclasses.dataclass(frozen=True)
class PolarParams:
    K: int                  # payload + CRC bits
    E: int                  # rate-matched output length
    N: int                  # mother code length
    n_pc: int
    n_pc_wm: int
    il_pattern: tuple       # (K,) input interleaver Pi(k)
    info_mask: tuple        # (N,) 1 = info/pc position
    pc_mask: tuple          # (N,) 1 = parity-check position
    rm_indices: tuple       # (E,) e_k = y[rm_indices[k]] after subblock interleave
    channel_perm: tuple     # (E,) channel interleaver (I_BIL)
    mode: str               # 'repetition' | 'puncturing' | 'shortening'

    @property
    def info_positions(self) -> np.ndarray:
        m = np.array(self.info_mask, bool) & ~np.array(self.pc_mask, bool)
        return np.nonzero(m)[0]


def _compute_n(K: int, E: int, n_max: int) -> int:
    cl = math.ceil(math.log2(E))
    if E <= (9 / 8) * 2 ** (cl - 1) and K / E < 9 / 16:
        n1 = cl - 1
    else:
        n1 = cl
    n2 = math.ceil(math.log2(K * 8))  # R_min = 1/8
    return max(min(n1, n2, n_max), 5)


def _channel_interleaver(E: int, i_bil: bool) -> np.ndarray:
    """TS 38.212 §5.4.1.3 triangular channel interleaver (UL only)."""
    if not i_bil:
        return np.arange(E, dtype=np.int32)
    T = 0
    while T * (T + 1) // 2 < E:
        T += 1
    v = -np.ones((T, T), dtype=np.int64)
    k = 0
    for i in range(T):
        for j in range(T - i):
            if k < E:
                v[i, j] = k
            k += 1
    out = v.T[v.T >= 0]
    return out.astype(np.int32)


@functools.lru_cache(maxsize=256)
def polar_params(K: int, E: int, n_max: int, i_il: bool, n_pc: int = 0, n_pc_wm: int = 0, i_bil: bool = False) -> PolarParams:
    """Build all static patterns for one polar configuration.

    Parity anchor: nr_polar_init.c + nr_polar_procedures.c
    (nr_polar_info_bit_pattern:227, nr_polar_rate_matching_pattern:362).
    """
    N = 1 << _compute_n(K + n_pc, E, n_max)
    q = polar_reliability_sequence(N)

    # input interleaver (IL): K-bit pattern from Pi_IL_max
    if i_il:
        kmax = 164
        pat = _PI_IL_MAX[_PI_IL_MAX >= (kmax - K)] - (kmax - K)
        il = pat.astype(np.int32)
        assert len(il) == K
    else:
        il = np.arange(K, dtype=np.int32)

    # sub-block interleaver J: position m of y takes d[J[m]]
    nb = N // 32
    J = (SUBBLOCK_PERM[np.arange(N) // nb] * nb + np.arange(N) % nb).astype(np.int32)

    # pre-frozen positions from rate matching
    prefrozen = np.zeros(N, dtype=bool)
    Kp = K + n_pc
    if E < N:
        if Kp / E <= 7 / 16:
            mode = "puncturing"
            prefrozen[J[: N - E]] = True
            if E / N >= 3 / 4:
                limit = math.ceil((3 * N - 2 * E) / 4)
            else:
                limit = math.ceil((9 * N - 4 * E) / 16)
            prefrozen[:limit] = True
        else:
            mode = "shortening"
            prefrozen[J[E:]] = True
    else:
        mode = "repetition"

    # (K + n_pc) most reliable positions not pre-frozen
    usable = q[~prefrozen[q]]          # ascending reliability
    qi = usable[-Kp:]                  # most reliable Kp positions (ascending rel.)
    info_mask = np.zeros(N, dtype=bool)
    info_mask[qi] = True
    pc_mask = np.zeros(N, dtype=bool)
    if n_pc > 0:
        # least reliable (n_pc - n_pc_wm) of the selected set
        pc_mask[qi[: n_pc - n_pc_wm]] = True
        if n_pc_wm > 0:
            # TS 38.212 §5.3.1.2: among the most reliable positions, the one(s)
            # of minimum row weight; row weight of i = 2^{popcount(i)}
            cand = qi[n_pc - n_pc_wm:]
            w = np.array([bin(int(x)).count("1") for x in cand])
            # pick highest-reliability index among those with min weight
            minw = w.min()
            sel = cand[w == minw][-n_pc_wm:]
            pc_mask[sel] = True

    # rate-matching output: e_k = y[idx]
    if mode == "repetition":
        rm = np.arange(E, dtype=np.int32) % N
    elif mode == "puncturing":
        rm = (np.arange(E, dtype=np.int32) + (N - E))
    else:
        rm = np.arange(E, dtype=np.int32)

    cperm = _channel_interleaver(E, i_bil)

    return PolarParams(
        K=K, E=E, N=N, n_pc=n_pc, n_pc_wm=n_pc_wm,
        il_pattern=tuple(il.tolist()),
        info_mask=tuple(info_mask.astype(np.int8).tolist()),
        pc_mask=tuple(pc_mask.astype(np.int8).tolist()),
        rm_indices=tuple(rm.tolist()),
        channel_perm=tuple(cperm.tolist()),
        mode=mode,
    )


def polar_transform(u: jnp.ndarray) -> jnp.ndarray:
    """x = u @ G_N over GF(2), G_N = kron^n [[1,0],[1,1]] (no bit reversal)."""
    N = u.shape[-1]
    x = u
    m = 1
    while m < N:
        lead = x.shape[:-1]
        x = x.reshape(*lead, N // (2 * m), 2, m)
        top = x[..., 0, :] ^ x[..., 1, :]
        x = jnp.stack([top, x[..., 1, :]], axis=-2).reshape(*lead, N)
        m *= 2
    return x


def _build_u(params: PolarParams, payload: jnp.ndarray) -> jnp.ndarray:
    """Place interleaved payload bits into info positions, computing PC bits."""
    p = params
    lead = payload.shape[:-1]
    c = jnp.take(payload, jnp.asarray(p.il_pattern, dtype=jnp.int32), axis=-1)
    info_mask = np.array(p.info_mask, bool)
    pc_mask = np.array(p.pc_mask, bool)
    data_pos = np.nonzero(info_mask & ~pc_mask)[0]
    if p.n_pc == 0:
        u = jnp.zeros((*lead, p.N), dtype=payload.dtype)
        return u.at[..., jnp.asarray(data_pos)].set(c)

    # sequential PC-register walk (UCI only; N <= 1024)
    is_data = jnp.asarray(info_mask & ~pc_mask, dtype=jnp.int8)
    is_pc = jnp.asarray(pc_mask, dtype=jnp.int8)
    # per-position index into payload (prefix sum of is_data)
    data_idx = jnp.asarray(np.maximum(np.cumsum(info_mask & ~pc_mask) - 1, 0), dtype=jnp.int32)

    def step(carry, i):
        reg = carry  # (..., 5)
        reg = jnp.roll(reg, -1, axis=-1)
        bit_data = jnp.take_along_axis(c, jnp.broadcast_to(data_idx[i], (*lead, 1)), axis=-1)[..., 0]
        u_i = jnp.where(is_pc[i] == 1, reg[..., 0], jnp.where(is_data[i] == 1, bit_data, 0))
        reg = reg.at[..., 0].set(jnp.where(is_pc[i] == 1, reg[..., 0], reg[..., 0] ^ u_i))
        return reg, u_i

    reg0 = jnp.zeros((*lead, 5), dtype=payload.dtype)
    _, u_seq = jax.lax.scan(step, reg0, jnp.arange(p.N))
    # scan stacks along axis 0 -> move to last
    u = jnp.moveaxis(u_seq, 0, -1)
    return u


def encode(params: PolarParams, payload: jnp.ndarray) -> jnp.ndarray:
    """(batch, K) payload (incl. CRC) -> (batch, E) rate-matched bits."""
    p = params
    u = _build_u(p, payload.astype(jnp.int8))
    d = polar_transform(u)
    # sub-block interleave: y[m] = d[J[m]]
    nb = p.N // 32
    J = jnp.asarray((SUBBLOCK_PERM[np.arange(p.N) // nb] * nb + np.arange(p.N) % nb).astype(np.int32))
    y = jnp.take(d, J, axis=-1)
    e = jnp.take(y, jnp.asarray(p.rm_indices, dtype=jnp.int32), axis=-1)
    # channel interleaver: f[k] = e[cip[k]]  (I_BIL=1 for UL)
    return jnp.take(e, jnp.asarray(p.channel_perm, dtype=jnp.int32), axis=-1)


def rate_recover_llr(params: PolarParams, llr_e: jnp.ndarray, big: float = 1e4) -> jnp.ndarray:
    """(batch, E) channel LLRs -> (batch, N) mother-code LLRs."""
    p = params
    lead = llr_e.shape[:-1]
    # undo channel interleaver
    cperm = jnp.asarray(p.channel_perm, dtype=jnp.int32)
    e = jnp.zeros_like(llr_e).at[..., cperm].set(llr_e)
    # undo bit selection into y (repetition adds)
    y = jnp.zeros((*lead, p.N), llr_e.dtype).at[..., jnp.asarray(p.rm_indices, dtype=jnp.int32)].add(e)
    if p.mode == "shortening":
        y = y.at[..., p.E:].add(big)  # shortened bits known zero
    # undo sub-block interleave (J is a bijection): d[J[m]] = y[m]
    nb = p.N // 32
    J = jnp.asarray((SUBBLOCK_PERM[np.arange(p.N) // nb] * nb + np.arange(p.N) % nb).astype(np.int32))
    d = jnp.zeros((*lead, p.N), llr_e.dtype).at[..., J].set(y)
    return d


# --------------------------------------------------------------------------
# SCL decoder
# --------------------------------------------------------------------------

_PBIG = jnp.float32(1e9)


def _f_minsum(a, b):
    """Check-node combine. Min-sum with a correction term ~= the exact
    log-domain f (boxplus), worth ~0.3 dB on PBCH-size codes:
    f(a,b) = sign(a)sign(b)min(|a|,|b|) + log((1+e^-|a+b|)/(1+e^-|a-b|))."""
    ms = jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a), jnp.abs(b))
    corr = jnp.log1p(jnp.exp(-jnp.abs(a + b))) - jnp.log1p(jnp.exp(-jnp.abs(a - b)))
    return ms + corr


def _prune(metrics2, tensors, L):
    """Keep L best of 2L candidates; tensors are (B, 2L, ...) stacked."""
    order = jnp.argsort(metrics2, axis=1)[:, :L]  # (B, L)
    def take(t):
        idx = order.reshape(order.shape + (1,) * (t.ndim - 2))
        return jnp.take_along_axis(t, jnp.broadcast_to(idx, (t.shape[0], L) + t.shape[2:]), axis=1)
    new_metrics = jnp.take_along_axis(metrics2, order, axis=1)
    return new_metrics, [take(t) for t in tensors], order


def scl_decode(params: PolarParams, llr_n: jnp.ndarray, list_size: int = 8):
    """SCL decode of (B, N) mother-code LLRs.

    Returns (u_cands (B, L, K) payload-bit candidates ordered best-first by
    path metric, metrics (B, L)).  CRC selection is up to the caller
    (decode_with_crc below).
    """
    p = params
    B, N = llr_n.shape
    L = list_size
    info_mask = np.array(p.info_mask, bool)
    pc_mask = np.array(p.pc_mask, bool)
    use_pc = p.n_pc > 0

    # state threaded through recursion
    metrics = jnp.zeros((B, L), jnp.float32).at[:, 1:].add(_PBIG)  # only path 0 live
    llr0 = jnp.broadcast_to(llr_n[:, None, :], (B, L, N)).astype(jnp.float32)
    u_hist = jnp.zeros((B, L, N), jnp.int8)
    reg = jnp.zeros((B, L, 5), jnp.int8)

    leaf_counter = [0]

    def node(llr, stack, metrics, u_hist, reg):
        M = llr.shape[-1]
        i0 = leaf_counter[0]
        sub_info = info_mask[i0: i0 + M]
        if not sub_info.any():
            # rate-0 subtree: all bits 0, penalty for negative llrs
            leaf_counter[0] += M
            metrics = metrics + jnp.sum(jnp.where(llr < 0, jnp.abs(llr), 0.0), axis=-1)
            if use_pc and M % 5:
                reg = jnp.roll(reg, -(M % 5), axis=-1)  # M frozen-bit register rotations
            x = jnp.zeros_like(llr, dtype=jnp.int8)
            return x, stack, metrics, u_hist, reg
        if M == 1:
            i = leaf_counter[0]
            leaf_counter[0] += 1
            lv = llr[..., 0]  # (B, L)
            pen0 = jnp.where(lv < 0, jnp.abs(lv), 0.0)
            pen1 = jnp.where(lv > 0, jnp.abs(lv), 0.0)
            if use_pc:
                reg = jnp.roll(reg, -1, axis=-1)
            if pc_mask[i]:
                forced = reg[..., 0]
                pen = jnp.where(forced == 0, pen0, pen1)
                metrics = metrics + pen
                bit = forced
                u_hist = u_hist.at[:, :, i].set(bit)
                x = bit[..., None].astype(jnp.int8)
                return x, stack, metrics, u_hist, reg
            # info leaf: branch into 2L candidates
            m0 = metrics + pen0
            m1 = metrics + pen1
            metrics2 = jnp.concatenate([m0, m1], axis=1)  # (B, 2L)
            bits2 = jnp.concatenate(
                [jnp.zeros((B, L), jnp.int8), jnp.ones((B, L), jnp.int8)], axis=1)
            doubled = [jnp.concatenate([t, t], axis=1) for t in (list(stack) + [u_hist, reg])]
            metrics, kept, order = _prune(metrics2, doubled + [bits2[..., None]], L)
            bits = kept[-1][..., 0]
            *stack_new, u_hist, reg = kept[:-1]
            u_hist = u_hist.at[:, :, i].set(bits)
            if use_pc:
                reg = reg.at[..., 0].set(reg[..., 0] ^ bits)
            x = bits[..., None]
            return x, tuple(stack_new), metrics, u_hist, reg
        h = M // 2
        a, b = llr[..., :h], llr[..., h:]
        f = _f_minsum(a, b)
        x_l, stack2, metrics, u_hist, reg = node(f, stack + (llr,), metrics, u_hist, reg)
        llr_s = stack2[-1]
        stack2 = stack2[:-1]
        a, b = llr_s[..., :h], llr_s[..., h:]
        g = b + (1 - 2 * x_l.astype(jnp.float32)) * a
        x_r, stack3, metrics, u_hist, reg = node(g, stack2 + (x_l,), metrics, u_hist, reg)
        x_l = stack3[-1]
        stack3 = stack3[:-1]
        x = jnp.concatenate([x_l ^ x_r, x_r], axis=-1)
        return x, stack3, metrics, u_hist, reg

    _, _, metrics, u_hist, _ = node(llr0, (), metrics, u_hist, reg)
    assert leaf_counter[0] == N
    data_pos = np.nonzero(info_mask & ~pc_mask)[0]
    c = u_hist[:, :, jnp.asarray(data_pos)]  # (B, L, K): c_k in encode order
    # undo input interleaver (encode did c_k = payload[il[k]]):
    # payload[j] = c[argsort(il)[j]]
    il = np.array(p.il_pattern)
    payload = jnp.take(c, jnp.asarray(np.argsort(il)), axis=-1)
    return payload, metrics


def decode_with_crc(
    params: PolarParams,
    llr_e: jnp.ndarray,
    crc_name: str,
    list_size: int = 8,
    crc_mask: jnp.ndarray | None = None,
):
    """Full RX: rate recovery + SCL + CRC path selection.

    crc_mask: optional (Lcrc,) bits XORed onto the computed CRC before
    comparison (RNTI scrambling of DCI CRC).
    Returns (payload_bits (B, A), crc_pass (B,)).
    """
    llr_n = rate_recover_llr(params, llr_e)
    cands, metrics = scl_decode(params, llr_n, list_size)
    from .crc import CRC_POLYS
    Lc, _ = CRC_POLYS[crc_name]
    payload, rx_crc = cands[..., :-Lc], cands[..., -Lc:]
    calc = crc_compute(payload, crc_name)
    if crc_mask is not None:
        calc = calc ^ crc_mask.astype(calc.dtype)
    ok = jnp.all(calc == rx_crc, axis=-1)  # (B, L)
    # first (best-metric) passing path, else best metric path
    any_ok = jnp.any(ok, axis=1)
    pick = jnp.where(any_ok, jnp.argmax(ok, axis=1), 0)
    sel = jnp.take_along_axis(payload, pick[:, None, None], axis=1)[:, 0]
    return sel, any_ok
