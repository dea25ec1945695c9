"""Fused PUSCH frontend kernel: chest + MRC/MMSE + max-log LLR in ONE
Pallas program per slot (P21/P22/P24 hot path).

The reference fuses exactly this span per symbol job in `inner_rx`
(openair1/PHY/NR_TRANSPORT/nr_ulsch_demodulation.c:1262: channel
estimation feeds compensation feeds LLR without leaving L1 cache).  The
round-3 XLA chain spent 1.11 of 2.33 ms/step here as ~40 small VPU ops
whose fixed per-op dispatch cost dominated (docs/PERF.md) — this kernel
collapses them into one VMEM-resident pass.

TPU design notes:
  * NO gathers or compaction anywhere: DMRS comb-2 pilots live on the
    even/odd lanes of the full subcarrier grid, so LS, CDM pair
    separation, the pilot moving average and comb-2 interpolation are all
    expressed with masked `pltpu.roll`s and one log-doubling masked
    cumsum along the lane axis.  (A stride-2 lane slice costs a Mosaic
    relayout that measured ~10% slower than gathers on the XLA chain;
    rolls+selects beat both.)
  * Grid = (batch,): one program per slot; everything for a slot fits
    VMEM (~8 MB at 273 PRB, 2x2, 64QAM).
  * complex never enters the kernel: IQ as separate f32 re/im planes.
  * Exactly replicates the XLA reference path in models/pusch.py
    (pusch_channel_estimate + pusch_equalize + llr.llrs), including the
    replicate-padded moving average edge handling, so BLER/conformance
    results are unchanged (fp association differs only inside the
    cumsum).

Supported fast path: CP-OFDM, single-symbol DMRS (any count of DMRS
positions), 1-2 layers with a common CDM delta, any n_rx, Qm in
{2,4,6,8}, 'window' chest mode.  models/pusch.py falls back to the XLA
chain otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SPAD = 16  # symbol rows per slot, padded (14 -> 16: f32 sublane tile)


def _pad_lanes(m: int, window: int) -> int:
    """Lane count: room for the +1 comb extension and the head roll of the
    moving average so circular wraps never reach valid lanes."""
    need = m + 2 * max(window, 2) + 8
    return -(-need // 128) * 128


def _iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _roll(x, k):
    return pltpu.roll(x, k % x.shape[-1], axis=x.ndim - 1)


def _masked_cumsum(x, mpad):
    """Inclusive prefix sum along lanes via log-doubling rolls; lanes
    rolled in from the circular wrap are zeroed each step."""
    it = _iota(x.shape)
    cs = x
    shift = 1
    while shift < mpad:
        cs = cs + jnp.where(it >= shift, _roll(cs, shift), 0.0)
        shift *= 2
    return cs


def _bcast_lane(x, lane, shape):
    """Broadcast the value at [:, lane] to `shape` (row-wise).

    Masked-sum form: Mosaic has no lowering for dynamic_slice on values,
    and a static slice of one lane still costs a relayout."""
    v = jnp.sum(jnp.where(_iota(x.shape) == lane, x, 0.0),
                axis=-1, keepdims=True)
    return jnp.broadcast_to(v, shape)


def _smooth_comb(hr, hi, delta, n_pil, window, mpad):
    """Replicate-padded moving average over the n_pil comb values living
    at lanes delta+2k of (rows, mpad) planes.  Returns planes valid at
    the comb lanes (garbage elsewhere).  Matches ce.freq_average."""
    if window <= 1:
        return hr, hi
    shape = hr.shape
    it = _iota(shape)
    comb = ((it - delta) % 2 == 0) & (it >= delta) & (it < delta + 2 * n_pil)
    pad_l = window // 2
    pad_r = window - 1 - pad_l
    last_lane = delta + 2 * (n_pil - 1)
    out = []
    for h in (hr, hi):
        hm = jnp.where(comb, h, 0.0)
        cs = _masked_cumsum(hm, mpad)
        head = _roll(cs, -2 * pad_r)
        tail = jnp.where(it >= 2 * pad_l + 1, _roll(cs, 2 * pad_l + 1), 0.0)
        # replicate-pad corrections: the left pad contributes
        # max(0, pad_l - i) copies of h[0], the right pad
        # max(0, i + pad_r - (n_pil-1)) copies of h[n_pil-1]
        i_f = ((it - delta) // 2).astype(jnp.float32)
        cl = jnp.maximum(0.0, pad_l - i_f)
        cr = jnp.minimum(float(pad_r),
                         jnp.maximum(0.0, i_f + pad_r - (n_pil - 1)))
        h0 = _bcast_lane(h, delta, shape)
        hl = _bcast_lane(h, last_lane, shape)
        out.append((head - tail + cl * h0 + cr * hl) / window)
    return out[0], out[1]


def _interp_comb2(hr, hi, delta, n_pil, m):
    """Comb-2 linear interpolation from lanes delta+2k to all m lanes
    (edge-hold), matching ce.comb2_interpolate."""
    shape = hr.shape
    it = _iota(shape)
    out = []
    for h in (hr, hi):
        if delta == 0:
            # extend one comb step past the end for the last odd lane
            h = jnp.where(it == delta + 2 * n_pil,
                          _bcast_lane(h, delta + 2 * (n_pil - 1), shape), h)
            mid = 0.5 * (_roll(h, 1) + _roll(h, -1))
            out.append(jnp.where(it % 2 == 1, mid, h))
        else:
            mid = 0.5 * (_roll(h, 1) + _roll(h, -1))
            full = jnp.where(it % 2 == 0, mid, h)
            # left edge: hold hs[0] at lane 0
            full = jnp.where(it == 0, _bcast_lane(h, 1, shape), full)
            out.append(full)
    return out[0], out[1]


def _llr_planes(xr, xi, mag, qm):
    """Max-log LLR bit planes from compensated (x, mag) — llr.llrs."""
    if qm == 2:
        s = np.float32(1.0 / np.sqrt(2.0))
        return [xr * s, xi * s]
    if qm == 4:
        t = np.float32(2.0 / np.sqrt(10.0)) * mag
        return [xr, xi, t - jnp.abs(xr), t - jnp.abs(xi)]
    if qm == 6:
        s = np.float32(1.0 / np.sqrt(42.0))
        t4, t2 = 4 * s * mag, 2 * s * mag
        b2 = t4 - jnp.abs(xr)
        b3 = t4 - jnp.abs(xi)
        return [xr, xi, b2, b3, t2 - jnp.abs(b2), t2 - jnp.abs(b3)]
    if qm == 8:
        s = np.float32(1.0 / np.sqrt(170.0))
        t8, t4, t2 = 8 * s * mag, 4 * s * mag, 2 * s * mag
        b2 = t8 - jnp.abs(xr)
        b3 = t8 - jnp.abs(xi)
        b4 = t4 - jnp.abs(b2)
        b5 = t4 - jnp.abs(b3)
        return [xr, xi, b2, b3, b4, b5, t2 - jnp.abs(b4), t2 - jnp.abs(b5)]
    raise ValueError(f"qm={qm}")


@functools.lru_cache(maxsize=64)
def _build(n_rx: int, n_layers: int, delta: int, n_prb: int, window: int,
           qm: int, dmrs_rows: tuple, n_dmrs_cdm: int, interpret: bool):
    """Compile-time closure for one config class.

    n_dmrs_cdm: 1 -> single-layer style (no CDM separation), 2 -> freq-OCC
    pair separation for the two ports of the delta comb.
    """
    R, P = n_rx, n_layers
    m = 12 * n_prb
    n_pil = 6 * n_prb
    n_pair = n_pil // 2
    mpad = _pad_lanes(m, window)
    n_d = len(dmrs_rows)

    def kernel(yre_ref, yim_ref, pre_ref, pim_ref, sgn_ref, out_ref):
        # ---- LS at the DMRS symbols, averaged ------------------------
        # ls zero off-comb because the pilot planes are zero off-comb
        ls_r = jnp.zeros((R, mpad), jnp.float32)
        ls_i = jnp.zeros((R, mpad), jnp.float32)
        per_sym = []            # kept for P=1 multi-symbol noise estimate
        for d, row in enumerate(dmrs_rows):
            yr = yre_ref[0, :, row, :]
            yi = yim_ref[0, :, row, :]
            pr = pre_ref[d: d + 1, :]
            pi = pim_ref[d: d + 1, :]
            lr = yr * pr + yi * pi          # y * conj(p)
            li = yi * pr - yr * pi
            per_sym.append((lr, li))
            ls_r = ls_r + lr
            ls_i = ls_i + li
        ls_r = ls_r / n_d
        ls_i = ls_i / n_d

        it2 = _iota((R, mpad))

        # ---- CDM separation + noise variance -------------------------
        if n_dmrs_cdm == 2:
            # pairs at lanes delta+4k: 0.5*(ls[k0] +/- ls[k0+2])
            ar = _roll(ls_r, -2)
            ai = _roll(ls_i, -2)
            ports = [(0.5 * (ls_r + ar), 0.5 * (ls_i + ai)),
                     (0.5 * (ls_r - ar), 0.5 * (ls_i - ai))][:P]
            # nvar from pair-to-pair differences per port
            dmask = (((it2 - delta) % 4 == 0) & (it2 >= delta)
                     & (it2 < delta + 4 * (n_pair - 1))).astype(jnp.float32)
            acc = jnp.zeros((1, 1), jnp.float32)
            for pvr, pvi in ports:
                ddr = _roll(pvr, -4) - pvr
                ddi = _roll(pvi, -4) - pvi
                e = (ddr * ddr + ddi * ddi) * dmask
                acc = acc + jnp.sum(jnp.sum(e, axis=1, keepdims=True),
                                    axis=0, keepdims=True)
            nvar = acc * (n_d / (R * len(ports) * (n_pair - 1)))
            # repeat2: spread the pair value from lane delta+4k to
            # delta+4k+2 so the full spacing-2 comb is populated
            hp = []
            for pvr, pvi in ports:
                sel = (it2 - delta) % 4 == 2
                hp.append((jnp.where(sel, _roll(pvr, 2), pvr),
                           jnp.where(sel, _roll(pvi, 2), pvi)))
        else:
            # P==1: estimate on the full comb, nvar from adjacent pilots
            # per DMRS symbol (pre-averaging), as the XLA path does
            dmask = (((it2 - delta) % 2 == 0) & (it2 >= delta)
                     & (it2 < delta + 2 * (n_pil - 1))).astype(jnp.float32)
            acc = jnp.zeros((1, 1), jnp.float32)
            for lr, li in per_sym:
                dr = _roll(lr, -2) - lr
                di = _roll(li, -2) - li
                e = (dr * dr + di * di) * dmask
                acc = acc + jnp.sum(jnp.sum(e, axis=1, keepdims=True),
                                    axis=0, keepdims=True)
            nvar = acc / (2.0 * R * n_d * (n_pil - 1))
            hp = [(ls_r, ls_i)]

        # ---- smoothing + interpolation per port ----------------------
        h = []
        for hr, hi in hp:
            hr, hi = _smooth_comb(hr, hi, delta, n_pil, window, mpad)
            hr, hi = _interp_comb2(hr, hi, delta, n_pil, m)
            h.append((hr, hi))

        # ---- equalize + LLR over the whole symbol block --------------
        yr_all = [yre_ref[0, r, :, :] for r in range(R)]
        yi_all = [yim_ref[0, r, :, :] for r in range(R)]
        if P == 1:
            hr, hi = h[0]
            mag = jnp.sum(hr * hr + hi * hi, axis=0, keepdims=True)
            xr = jnp.zeros((_SPAD, mpad), jnp.float32)
            xi = jnp.zeros((_SPAD, mpad), jnp.float32)
            for r in range(R):
                cr = hr[r: r + 1, :]
                ci = hi[r: r + 1, :]
                xr = xr + cr * yr_all[r] + ci * yi_all[r]
                xi = xi + cr * yi_all[r] - ci * yr_all[r]
            planes = [_llr_planes(xr, xi, mag, qm)]
        else:
            (h0r, h0i), (h1r, h1i) = h
            g00 = jnp.sum(h0r * h0r + h0i * h0i, axis=0, keepdims=True)
            g11 = jnp.sum(h1r * h1r + h1i * h1i, axis=0, keepdims=True)
            g01r = jnp.sum(h0r * h1r + h0i * h1i, axis=0, keepdims=True)
            g01i = jnp.sum(h0r * h1i - h0i * h1r, axis=0, keepdims=True)
            x0r = jnp.zeros((_SPAD, mpad), jnp.float32)
            x0i = jnp.zeros((_SPAD, mpad), jnp.float32)
            x1r = jnp.zeros((_SPAD, mpad), jnp.float32)
            x1i = jnp.zeros((_SPAD, mpad), jnp.float32)
            for r in range(R):
                c0r, c0i = h0r[r: r + 1, :], h0i[r: r + 1, :]
                c1r, c1i = h1r[r: r + 1, :], h1i[r: r + 1, :]
                x0r = x0r + c0r * yr_all[r] + c0i * yi_all[r]
                x0i = x0i + c0r * yi_all[r] - c0i * yr_all[r]
                x1r = x1r + c1r * yr_all[r] + c1i * yi_all[r]
                x1i = x1i + c1r * yi_all[r] - c1i * yr_all[r]
            nv = nvar  # (1,1) broadcasts over (1, mpad)
            a00 = g00 + nv
            a11 = g11 + nv
            absg2 = g01r * g01r + g01i * g01i
            inv = 1.0 / (a00 * a11 - absg2)
            e0r = (a11 * x0r - (g01r * x1r - g01i * x1i)) * inv
            e0i = (a11 * x0i - (g01r * x1i + g01i * x1r)) * inv
            e1r = (a00 * x1r - (g01r * x0r + g01i * x0i)) * inv
            e1i = (a00 * x1i - (g01r * x0i - g01i * x0r)) * inv
            m0 = (a11 * g00 - absg2) * inv
            m1 = (a00 * g11 - absg2) * inv
            planes = [_llr_planes(e0r, e0i, m0, qm),
                      _llr_planes(e1r, e1i, m1, qm)]

        # ---- emit one descrambled plane per (layer, bit) ---------------
        # The e-domain grouping (38.212 bit de-interleave groups by bit
        # index) means downstream only needs a cheap 2-wide layer
        # interleave in XLA; the qm-wide de-interleave is free (planes).
        for l in range(P):
            for j in range(qm):
                out_ref[0, l * qm + j, :, :] = (
                    planes[l][j] * sgn_ref[l * qm + j, :, :])

    nplanes = P * qm

    def run(yre, yim, pre, pim, sgn):
        B = yre.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, R, _SPAD, mpad), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, _SPAD, mpad), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_d, mpad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_d, mpad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nplanes, _SPAD, mpad), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nplanes, _SPAD, mpad),
                                   lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nplanes, _SPAD, mpad),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(yre, yim, pre, pim, sgn)

    return run, mpad


def supported(cfg) -> bool:
    """Fast-path eligibility; models/pusch.py falls back to XLA otherwise."""
    from ..phy import refsig
    if (cfg.transform_precoding or cfg.uses_re_map or cfg.dmrs_max_len != 1
            or cfg.chest_mode != "window" or cfg.n_layers > 2
            or cfg.qm_rate[0] not in (2, 4, 6, 8)
            or getattr(cfg, "receiver", "linear") != "linear"):
        return False
    deltas = {refsig.dmrs_type1_port_weights(p % 4)[1]
              for p in range(cfg.dmrs_port0, cfg.dmrs_port0 + cfg.n_layers)}
    if len(deltas) != 1:
        return False
    if cfg.n_layers == 2 and cfg.dmrs_port0 % 2 != 0:
        return False            # needs the (+1,-1) freq-OCC pair
    return True


@functools.lru_cache(maxsize=64)
def _sign_plane_np(n_prb: int, qm: int, P: int, data_symbols: tuple,
                   cinit: int, mpad: int):
    """(P*qm, SPAD, mpad) f32: descrambling sign (1-2c) permuted into the
    kernel's per-(layer, bit) plane layout; 0 on pad lanes/rows."""
    from ..phy.scrambling import gold_sequence_np
    m = 12 * n_prb
    S_d = len(data_symbols)
    G = S_d * m * P * qm
    c = gold_sequence_np(cinit, G).astype(np.float32)
    sgn4 = (1.0 - 2.0 * c).reshape(S_d, m, P, qm)
    out = np.zeros((P * qm, _SPAD, mpad), np.float32)
    perm = sgn4.transpose(2, 3, 0, 1).reshape(P * qm, S_d, m)
    for i, s in enumerate(data_symbols):
        out[:, s, :m] = perm[:, i]
    return out


def _run_kernel(cfg, re_grid, interpret: bool):
    from ..phy import refsig
    from ..phy.scrambling import pusch_cinit

    assert supported(cfg), "unsupported config for the fused frontend"
    qm = cfg.qm_rate[0]
    P = cfg.n_layers
    delta = refsig.dmrs_type1_port_weights(cfg.dmrs_port0 % 4)[1]
    m = 12 * cfg.n_prb
    run, mpad = _build(cfg.n_rx, P, delta, cfg.n_prb, cfg.chest_window, qm,
                       tuple(cfg.dmrs_symbols), 2 if P == 2 else 1, interpret)

    y = re_grid[..., cfg.sc0: cfg.sc0 + m]
    spad_extra = _SPAD - y.shape[2]
    pad = ((0, 0), (0, 0), (0, spad_extra), (0, mpad - m))
    yre = jnp.pad(jnp.real(y), pad)
    yim = jnp.pad(jnp.imag(y), pad)

    # pilot planes: pilot value at its comb lane, zero elsewhere
    pil = np.zeros((len(cfg.dmrs_symbols), mpad), np.complex64)
    for d, s in enumerate(cfg.dmrs_symbols):
        pil[d, delta: delta + 12 * cfg.n_prb: 2] = cfg.dmrs_pilot_np(s)
    cinit = (int(cfg.rnti) << 15) + (cfg.scrambling_q << 14) + cfg.n_id
    sgn = jnp.asarray(_sign_plane_np(
        cfg.n_prb, qm, P, tuple(cfg.data_symbols), cinit, mpad))
    out = run(yre, yim, jnp.asarray(pil.real), jnp.asarray(pil.imag), sgn)
    return out, mpad                            # (B, qm, 16, P*mpad)


def frontend_planes(cfg, re_grid: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """RE grid (B, n_rx, symbols, n_sc_bwp) complex -> descrambled LLR bit
    planes (B, qm, G//qm) in the 38.212 e-domain order: plane j, flat
    position re*L+l.  Per-CB de-rate-matching consumes these as pure
    slices (coding/rate_matching.fused_rate_match_rx_planes) — the whole
    path has no transposes."""
    out, mpad = _run_kernel(cfg, re_grid, interpret)
    B = re_grid.shape[0]
    m = 12 * cfg.n_prb
    P = cfg.n_layers
    qm = cfg.qm_rate[0]
    S_d = len(cfg.data_symbols)
    rows = jnp.asarray(np.array(cfg.data_symbols))
    dat = out[:, :, rows, :m]                   # (B, P*qm, S_d, m)
    if P == 1:
        return dat.reshape(B, qm, S_d * m)
    # 2-wide layer interleave: plane j <- [re0_l0, re0_l1, re1_l0, ...]
    return (dat.reshape(B, P, qm, S_d, m)
            .transpose(0, 2, 3, 4, 1)
            .reshape(B, qm, S_d * m * P))


def frontend(cfg, re_grid: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Codeword-order LLRs (B, G) from the fused kernel — semantics
    identical to models.pusch.pusch_frontend on the supported path.

    Production uses frontend_planes (slice-consumable); this wrapper
    re-interleaves to cw order for parity testing and fallback callers
    (one transpose)."""
    from ..phy import llr as llr_mod

    planes = frontend_planes(cfg, re_grid, interpret)
    B = planes.shape[0]
    qm = cfg.qm_rate[0]
    P = cfg.n_layers
    n_re = planes.shape[2] // P
    llr_cw = (planes.reshape(B, qm, n_re, P)
              .transpose(0, 2, 3, 1)
              .reshape(B, n_re * P * qm))
    if cfg.llr_quant_bits:
        llr_cw = llr_mod.quantize(llr_cw, bits=cfg.llr_quant_bits)
    return llr_cw
