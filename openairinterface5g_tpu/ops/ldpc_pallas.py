"""Pallas TPU kernel: LDPC flooding min-sum decoder, fully VMEM-resident.

The performance centerpiece (SURVEY.md P10).  The reference needs
build-time codegen of per-(BG, Z, rate) AVX2 kernels
(nrLDPC_decoder/nrLDPC_tools/generator_cnProc/...); here the static
lifted graph is unrolled at *trace* time into one Pallas program:

* grid = (batch/sb,); each program decodes `sb` (default 16) code blocks
  with the CB dim on the sublanes and the lifting dim Z on the lanes, so
  every edge message is one (sb, Z) vector register tile.
* all messages live in VMEM for the whole decode: c2v (E, sb, Z) plus
  column totals — zero HBM traffic between iterations (the reference
  streams cnProcBuf/bnProcBuf through L1/L2 per iteration).
* cyclic shifts are static-jnp.roll on the lane axis (the graph is
  static), replacing the reference's LUT-driven shuffles.

Flooding schedule: messages stored in VN (unrotated) orientation so
variable-node accumulation is pure adds; rotations happen only inside
the check-node pass (rotate v2c by -shift, rotate the min-sum result
back by +shift).  Each edge belongs to exactly one check row, so
updating c2v in the row loop while totals stay fixed preserves the
flooding schedule.

Layered schedule (the fast path): **rotation composition** halves the
lane-roll count per iteration, the dominant cost on the VPU.  c2v
messages are stored already rotated into their check row's orientation
(so the min-sum result needs no roll-back), and each column's APP total
is kept in the orientation of the row that last consumed it; moving to
the next row costs a single composed roll by (prev_shift - shift).
Because the row schedule is static and cyclic, the orientation at the
iteration boundary is a fixed per-column `entry_shift`, applied once to
the input LLRs and undone once on the output hard bits.  This replaces
the reference's LUT-driven cnProcBuf/bnProcBuf shuffles
(nrLDPC_decoder.c:206-881) with ~E rolls/iter instead of 2E.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..coding.ldpc import LDPCGraph, build_graph

_BIG = np.float32(1e30)


def _edges(graph: LDPCGraph):
    """Static edge list grouped by row: [(row, [(col, shift), ...]), ...]."""
    out = []
    for r in range(graph.rows):
        cols = np.nonzero(graph.tab[r] >= 0)[0]
        out.append((r, [(int(c), int(graph.tab[r, c])) for c in cols]))
    return out


@functools.lru_cache(maxsize=32)
def _build_decoder(bg: int, Z: int, n_iters: int, alpha: float,
                   schedule: str = "layered", sb: int = 16, msg_dtype=jnp.float32,
                   check_every: int = 0, debug_noroll: bool = False,
                   layout: str = "col", in_dtype=jnp.float32):
    """msg_dtype selects the numeric path:
      float32  — float messages/totals (default)
      bfloat16 — bf16 messages AND compute: half the vector registers per
                 (sb, Z) tile, ~2x VPU throughput; LLR inputs are clipped
                 to +-24 so totals stay in bf16's exact-integer range
      int8     — int8 message storage + int32 compute, saturating,
                 alpha = 13/16 exactly: the reference's 8-bit fixed-point
                 semantics (nrLDPC_cnProc.h); 4x less message VMEM.
    The int8 path expects int32 LLRs pre-quantized to [-127, 127].
    debug_noroll: timing-isolation mode — skips all lane rotations
    (decodes garbage; only for measuring the roll share of kernel time).

    layout selects the I/O tiling:
      'col'  — (C, n_groups*sb, Z) blocks (any Z); the XLA caller pays a
               (B, C, Z) -> (C, B, Z) transpose each way (~0.2 ms at the
               87 MB flagship buffer)
      'flat' — (n_groups*sb, C*Z) B-major blocks, requires Z % 128 == 0:
               column c is the pure lane-range slice [:, c*Z:(c+1)*Z], so
               the rate-matched buffer feeds the kernel with ZERO
               transposes end to end.
    in_dtype: input LLR dtype for the flat path (bf16 halves the HBM
    traffic of the staged buffer; cast to acc_dtype on the VMEM load).
    """
    graph = build_graph(bg, Z)
    rows_edges = _edges(graph)
    C = graph.cols
    E = sum(len(es) for _, es in rows_edges)
    # flat edge index per (row-local order)
    edge_base = np.cumsum([0] + [len(es) for _, es in rows_edges])
    # layered-schedule iteration-boundary orientation per column: the shift
    # of the last row (in schedule order) that touches it; 0 under flooding
    entry_shift = np.zeros(C, dtype=np.int64)
    if schedule == "layered":
        for _, es in rows_edges:
            for c, s in es:
                entry_shift[c] = s % Z

    int_path = msg_dtype == jnp.int8
    # int8 message storage with int32 compute: this Mosaic version exposes
    # no int16/int8 vector ALU ops (min/abs/select), so accumulation and
    # the min-sum tree run in int32; VMEM still shrinks 4x vs f32 messages
    if int_path:
        acc_dtype = jnp.int32
        big = np.int32(2**30)
    elif msg_dtype == jnp.bfloat16:
        import ml_dtypes
        acc_dtype = jnp.bfloat16
        big = ml_dtypes.bfloat16(3e38)
    else:
        acc_dtype = jnp.float32
        big = _BIG
    # bf16 path keeps every tile 16-bit-layout inside the kernel: bool
    # masks over bf16 convert to bf16 0/1 (same width), never int8/int32
    bits_dtype = jnp.bfloat16 if acc_dtype == jnp.bfloat16 else jnp.int8

    def _roll(x, s):
        if debug_noroll or s % Z == 0:
            return x
        return jnp.roll(x, s, axis=-1)

    def _scale(mag):
        if int_path:  # alpha = 13/16 = 0.8125 exactly, integer-only
            return (mag * 13 + 8) >> 4
        if acc_dtype == jnp.bfloat16:
            import ml_dtypes
            return mag * ml_dtypes.bfloat16(alpha)
        return mag * np.float32(alpha)

    def _sat(val):
        if int_path:
            return jnp.clip(val, -127, 127).astype(jnp.int8)
        return val.astype(msg_dtype)

    def _sign(v):
        """±1 in acc_dtype (float paths keep sign algebra in the message
        dtype — int32 xors force 16↔32-bit layout changes in Mosaic)."""
        return jnp.where(v < 0, jnp.full_like(v, -1), jnp.full_like(v, 1))

    def _cn_minsum(rot):
        """min1/min2/sign across a row's rotated v2c messages.
        Returns sgn = int32 parity (int path) or ±1 product (float paths)."""
        m1 = jnp.full_like(rot[0], big)
        m2 = jnp.full_like(rot[0], big)
        sgn = (jnp.zeros_like(rot[0], dtype=jnp.int32) if int_path
               else jnp.full_like(rot[0], 1))
        mags = []
        for v in rot:
            a = jnp.abs(v)
            mags.append(a)
            new_m1 = jnp.minimum(m1, a)
            m2 = jnp.minimum(m2, jnp.maximum(m1, a))
            m1 = new_m1
            if int_path:
                sgn = sgn ^ (v < 0).astype(jnp.int32)
            else:
                sgn = sgn * _sign(v)
        return m1, m2, sgn, mags

    def _edge_val(mag, sgn, v):
        """c2v magnitude+sign for one edge given the row aggregates."""
        if int_path:
            neg = sgn ^ (v < 0).astype(jnp.int32)
            return jnp.where(neg == 1, -mag, mag)
        return mag * sgn * _sign(v)

    flat = layout == "flat"
    if flat:
        assert Z % 128 == 0, "flat layout needs lane-aligned column slices"

    def kernel(llr_ref, bits_ref, ok_ref, c2v, totals, done):
        # llr_ref, bits_ref: (C, sb, Z) ['col'] or (sb, C*Z) ['flat'];
        # c2v: (E, sb, Z); totals: (C, sb, Z)
        # done: (1,) SMEM flag for in-kernel early termination — once every
        # code block in this group satisfies all parity checks, remaining
        # fori iterations become no-ops (the decode_abort_t / CRC-early-stop
        # analog of nrLDPC_decoder.c:554).
        def lcol(c):
            v = llr_ref[:, c * Z: (c + 1) * Z] if flat else llr_ref[c]
            return v.astype(acc_dtype) if v.dtype != acc_dtype else v

        def bput(c, v):
            if flat:
                bits_ref[:, c * Z: (c + 1) * Z] = v
            else:
                bits_ref[c] = v

        c2v[...] = jnp.zeros((E, sb, Z), msg_dtype)
        if schedule == "layered":
            # pre-rotate each column into its iteration-boundary orientation
            for c in range(C):
                e = int(entry_shift[c])
                totals[c] = _roll(lcol(c), -e)
        else:
            for c in range(C):
                totals[c] = lcol(c)
        done[0] = 0

        def _syndrome_ok():
            """1 iff every row's parity holds for every CB in the group."""
            if int_path:
                bad = jnp.zeros((sb, Z), jnp.int32)
                for ri, (r, es) in enumerate(rows_edges):
                    syn = jnp.zeros((sb, Z), jnp.int32)
                    for d, (c, s) in enumerate(es):
                        b = (totals[c] < 0).astype(jnp.int32)
                        off = (int(entry_shift[c]) - s) % Z
                        syn = syn ^ _roll(b, off)
                    bad = bad | syn
                return (jnp.sum(bad) == 0).astype(jnp.int32)
            # float paths: parity as a product of ±1 signs, min over rows
            good = jnp.full((sb, Z), 1, acc_dtype)
            for ri, (r, es) in enumerate(rows_edges):
                syn = jnp.full((sb, Z), 1, acc_dtype)
                for d, (c, s) in enumerate(es):
                    off = (int(entry_shift[c]) - s) % Z
                    syn = syn * _roll(_sign(totals[c]), off)
                good = jnp.minimum(good, syn)
            n_bad = jnp.sum((good < 0).astype(jnp.float32))
            return (n_bad == 0).astype(jnp.int32)

        def flooding_iter(_, carry):
            # check-node pass with totals fixed (each edge belongs to one
            # row, so in-loop c2v updates don't leak between rows)
            for ri, (r, es) in enumerate(rows_edges):
                base = int(edge_base[ri])
                rot = []
                for d, (c, s) in enumerate(es):
                    v2c = totals[c] - c2v[base + d].astype(acc_dtype)
                    rot.append(_roll(v2c, -s))
                m1, m2, sgn, mags = _cn_minsum(rot)
                for d, (c, s) in enumerate(es):
                    mag = _scale(jnp.where(mags[d] == m1, m2, m1))
                    val = _edge_val(mag, sgn, rot[d])
                    c2v[base + d] = _sat(_roll(val, s))
            # variable-node pass
            for c in range(C):
                totals[c] = lcol(c)
            for ri, (r, es) in enumerate(rows_edges):
                base = int(edge_base[ri])
                for d, (c, s) in enumerate(es):
                    totals[c] = totals[c] + c2v[base + d].astype(acc_dtype)
            return carry

        def layered_iter(_, carry):
            # row-layered schedule with rotation composition: totals live in
            # the last-visited row's orientation, c2v in check orientation —
            # one composed roll per edge instead of a roll in + roll back.
            # The rolled totals are NOT written back: they stay in registers
            # for the row and the (single) VMEM store happens at the update,
            # halving totals traffic vs a store-on-roll + store-on-update.
            cur = {c: int(entry_shift[c]) for c in range(C)}
            for ri, (r, es) in enumerate(rows_edges):
                base = int(edge_base[ri])
                rot, tloc, old = [], [], []
                for d, (c, s) in enumerate(es):
                    # stored = roll(nat, -cur); row view = roll(nat, -s)
                    #        = roll(stored, cur - s)
                    delta = (cur[c] - s) % Z
                    t = _roll(totals[c], delta)
                    cur[c] = s % Z
                    o = c2v[base + d].astype(acc_dtype)
                    tloc.append(t)
                    old.append(o)
                    rot.append(t - o)
                m1, m2, sgn, mags = _cn_minsum(rot)
                for d, (c, s) in enumerate(es):
                    mag = _scale(jnp.where(mags[d] == m1, m2, m1))
                    new_c2v = _sat(_edge_val(mag, sgn, rot[d]))
                    # totals[c] = llr-part + sum c2v: replace old with new
                    totals[c] = tloc[d] + (new_c2v.astype(acc_dtype) - old[d])
                    c2v[base + d] = new_c2v
            # schedule is cyclic: cur == entry_shift again at the boundary
            assert all(cur[c] == int(entry_shift[c]) for c in range(C))
            return carry

        inner = layered_iter if schedule == "layered" else flooding_iter
        if check_every:
            # in-kernel early termination (decode_abort_t / parity-early-
            # stop analog, nrLDPC_decoder.c:554): a fixed-trip fori_loop
            # whose body is PREDICATED on the SMEM done flag with pl.when
            # — Mosaic's native predication, unlike the dynamic-trip
            # while_loop it rejects on hardware.  Once every CB in the
            # sb-group passes parity, remaining iterations skip all work
            # (the loop shell itself is ~free).  The syndrome sweep costs
            # ~1 iteration of rolls, so it runs every `check_every` iters.
            def guarded(it, carry):
                @pl.when(done[0] == 0)
                def _():
                    inner(it, 0)

                    @pl.when((it % check_every) == check_every - 1)
                    def _():
                        done[0] = _syndrome_ok()
                return carry

            jax.lax.fori_loop(0, n_iters, guarded, 0)
        else:
            jax.lax.fori_loop(0, n_iters, inner, 0)
        if schedule == "layered":
            # undo the per-column iteration-boundary rotation
            for c in range(C):
                e = int(entry_shift[c])
                bput(c, _roll((totals[c] < 0).astype(bits_dtype), e))
        else:
            for c in range(C):
                bput(c, (totals[c] < 0).astype(bits_dtype))
        # per-CB parity flag computed in VMEM (one extra E-roll sweep —
        # ~1 iteration of cost) instead of the former XLA gather epilogue,
        # which dominated the whole decode at large Z
        if int_path:
            bad = jnp.zeros((sb, Z), jnp.int32)
            for ri, (r, es) in enumerate(rows_edges):
                syn = jnp.zeros((sb, Z), jnp.int32)
                for d, (c, s) in enumerate(es):
                    b = (totals[c] < 0).astype(jnp.int32)
                    off = (int(entry_shift[c]) - s) % Z
                    syn = syn ^ _roll(b, off)
                bad = bad | syn
            n_bad = jnp.sum(bad, axis=-1, keepdims=True)
        else:
            good = jnp.full((sb, Z), 1, acc_dtype)
            for ri, (r, es) in enumerate(rows_edges):
                syn = jnp.full((sb, Z), 1, acc_dtype)
                for d, (c, s) in enumerate(es):
                    off = (int(entry_shift[c]) - s) % Z
                    syn = syn * _roll(_sign(totals[c]), off)
                good = jnp.minimum(good, syn)
            n_bad = jnp.sum((good < 0).astype(jnp.float32), axis=-1,
                            keepdims=True)
        ok_ref[...] = jnp.broadcast_to((n_bad == 0).astype(jnp.int8), (sb, Z))

    def run(llr8):
        """'col': llr8 (C, n_groups*sb, Z) -> (bits (C, B, Z) int8,
        ok (B, Z) int8 with the flag replicated across lanes).
        'flat': llr8 (n_groups*sb, C*Z) -> (bits (B, C*Z) int8, ok (B, Z))."""
        if flat:
            n_groups = llr8.shape[0] // sb
            in_specs = [pl.BlockSpec((sb, C * Z), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)]
            bits_spec = pl.BlockSpec((sb, C * Z), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
            bits_shape = jax.ShapeDtypeStruct(llr8.shape, bits_dtype)
            n_b = llr8.shape[0]
        else:
            n_groups = llr8.shape[1] // sb
            in_specs = [pl.BlockSpec((C, sb, Z), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM)]
            bits_spec = pl.BlockSpec((C, sb, Z), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM)
            bits_shape = jax.ShapeDtypeStruct(llr8.shape, bits_dtype)
            n_b = llr8.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(n_groups,),
            in_specs=in_specs,
            out_specs=[
                bits_spec,
                pl.BlockSpec((sb, Z), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                bits_shape,
                jax.ShapeDtypeStruct((n_b, Z), jnp.int8),
            ],
            scratch_shapes=[
                pltpu.VMEM((E, sb, Z), msg_dtype),
                pltpu.VMEM((C, sb, Z), acc_dtype),
                pltpu.SMEM((1,), jnp.int32),
            ],
            # messages + totals + I/O blocks + spill stack exceed the 16MB
            # default scoped-vmem budget at Z=384; v5e VMEM is larger
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(llr8)

    return run, graph


@functools.lru_cache(maxsize=32)
def _build_decoder_bf16(bg: int, Z: int, n_iters: int, alpha: float,
                        sb: int = 32, check_every: int = 0):
    """bf16 sign-magnitude layered decoder.

    This libtpu's Mosaic rejects EVERY 16-bit mask op (select / compare-
    cast / copysign) but supports bf16 arithmetic (abs/min/max/add/mul/
    roll) and uint16 bitwise ops.  So the kernel runs the min-sum purely
    in that algebra — the same trick as the reference's AVX2 epi8 kernels
    (nrLDPC_cnProc.h: sign via XOR of sign bits, magnitude via unsigned
    min):

      * |v| and sign bit via bitcast + AND (bf16 is sign-magnitude)
      * per-edge excluded-min via prefix/suffix min arrays (no eq+select)
      * c2v sign = XOR of row sign bits ^ own sign, applied by XOR onto
        the magnitude word
      * hard bits = bf16 soft totals output, thresholded in XLA
      * parity flag via uint16 XOR syndrome, OR-accumulated, lane-reduced
        with the (bad|0x3f80) -> ±1.0 bitcast trick + bf16 min

    Half the vector registers and VMEM of the f32 path -> sb=32 fits,
    doubling per-instruction work (the kernel is issue-bound, not
    roll-bound: docs/PERF.md round-2 measurements).
    """
    graph = build_graph(bg, Z)
    rows_edges = _edges(graph)
    C = graph.cols
    E = sum(len(es) for _, es in rows_edges)
    edge_base = np.cumsum([0] + [len(es) for _, es in rows_edges])
    entry_shift = np.zeros(C, dtype=np.int64)
    for _, es in rows_edges:
        for c, s in es:
            entry_shift[c] = s % Z

    import ml_dtypes
    bf = jnp.bfloat16
    alpha_bf = ml_dtypes.bfloat16(alpha)
    big = ml_dtypes.bfloat16(3e38)
    SGN = np.uint16(0x8000)
    MAG = np.uint16(0x7FFF)
    ONE = np.uint16(0x3F80)  # 1.0 in bf16

    def _roll(x, s):
        return jnp.roll(x, s, axis=-1) if s % Z else x

    def kernel(llr_ref, soft_ref, ok_ref, c2v, totals):
        c2v[...] = jnp.zeros((E, sb, Z), bf)
        for c in range(C):
            totals[c] = _roll(llr_ref[c], -int(entry_shift[c]))

        def layered_iter(_, carry):
            cur = {c: int(entry_shift[c]) for c in range(C)}
            for ri, (r, es) in enumerate(rows_edges):
                base = int(edge_base[ri])
                d_row = len(es)
                tloc, old, sgn_b, mags = [], [], [], []
                sgn_all = None
                for d, (c, s) in enumerate(es):
                    delta = (cur[c] - s) % Z
                    t = _roll(totals[c], delta)
                    cur[c] = s % Z
                    o = c2v[base + d]
                    v = t - o
                    w = pltpu.bitcast(v, jnp.uint16)
                    sb_d = w & SGN
                    a = pltpu.bitcast(w & MAG, bf)
                    tloc.append(t)
                    old.append(o)
                    sgn_b.append(sb_d)
                    mags.append(a)
                    sgn_all = sb_d if sgn_all is None else (sgn_all ^ sb_d)
                # excluded min via prefix/suffix sweeps (all bf16 mins)
                pre = [None] * d_row
                suf = [None] * d_row
                acc = jnp.full((sb, Z), big, bf)
                for d in range(d_row):
                    pre[d] = acc
                    acc = jnp.minimum(acc, mags[d])
                acc = jnp.full((sb, Z), big, bf)
                for d in range(d_row - 1, -1, -1):
                    suf[d] = acc
                    acc = jnp.minimum(acc, mags[d])
                for d, (c, s) in enumerate(es):
                    excl = jnp.minimum(pre[d], suf[d])
                    mag = excl * alpha_bf
                    sgn = sgn_all ^ sgn_b[d]
                    val = pltpu.bitcast(pltpu.bitcast(mag, jnp.uint16) ^ sgn, bf)
                    totals[c] = tloc[d] + (val - old[d])
                    c2v[base + d] = val
            return carry

        jax.lax.fori_loop(0, n_iters, layered_iter, 0)

        # soft output in natural orientation (hard decision done in XLA)
        for c in range(C):
            soft_ref[c] = _roll(totals[c], int(entry_shift[c]))
        # parity: per-row XOR of rotated sign words, OR across rows,
        # then 'any lane set' via the (|0x3f80)->±1.0 min-reduce trick
        bad = jnp.zeros((sb, Z), jnp.uint16)
        for ri, (r, es) in enumerate(rows_edges):
            syn = jnp.zeros((sb, Z), jnp.uint16)
            for d, (c, s) in enumerate(es):
                w = pltpu.bitcast(totals[c], jnp.uint16) & SGN
                syn = syn ^ _roll(w, (int(entry_shift[c]) - s) % Z)
            bad = bad | syn
        flag = pltpu.bitcast(bad | ONE, bf)          # +1.0 ok / -1.0 bad
        ok_ref[...] = jnp.broadcast_to(
            jnp.min(flag, axis=-1, keepdims=True), (sb, Z))

    def run(llr_bf):
        n_groups = llr_bf.shape[1] // sb
        return pl.pallas_call(
            kernel,
            grid=(n_groups,),
            in_specs=[pl.BlockSpec((C, sb, Z), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((C, sb, Z), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sb, Z), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(llr_bf.shape, bf),
                jax.ShapeDtypeStruct((llr_bf.shape[1], Z), bf),
            ],
            scratch_shapes=[
                pltpu.VMEM((E, sb, Z), bf),
                pltpu.VMEM((C, sb, Z), bf),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(llr_bf)

    return run, graph


def decode_pallas(
    graph: LDPCGraph,
    llr: jnp.ndarray,
    n_iters: int = 8,
    alpha: float = 0.8125,
    schedule: str = "layered",
    sb: int | None = None,   # CB-group sublanes; default 16 (f32) / 32 (bf16)
    msg_dtype=jnp.float32,
    check_every: int = 0,   # in-kernel early stop (experimental: interpret-
                            # mode verified; current Mosaic rejects the
                            # predicated-iteration form on hardware)
    debug_noroll: bool = False,
):
    """Pallas-kernel decode: (B, cols*Z) LLRs -> (bits (B, K) int8, ok (B,)).

    B is padded up to a multiple of 8 internally.  Parity check runs as a
    cheap XLA epilogue on the hard bits.  schedule: 'layered' (default,
    ~2x faster convergence) or 'flooding' (reference-exact schedule).
    """
    B = llr.shape[0]
    Z, C = graph.Z, graph.cols
    if msg_dtype == jnp.bfloat16 and schedule == "layered":
        # dedicated sign-magnitude bitwise kernel (see _build_decoder_bf16)
        sb = 32 if sb is None else sb  # half-width tiles: 2x sublanes fit
        run, g = _build_decoder_bf16(graph.bg, graph.Z, n_iters, alpha, sb,
                                     check_every)
        Bp = -(-B // sb) * sb
        x = jnp.clip(llr.astype(jnp.float32), -24.0, 24.0).astype(jnp.bfloat16)
        x = x.reshape(B, C, Z)
        if Bp != B:
            x = jnp.concatenate([x, jnp.zeros((Bp - B, C, Z), x.dtype)], axis=0)
        x = x.transpose(1, 0, 2)
        soft_cbz, ok_bz = run(x)
        bits = (soft_cbz.transpose(1, 0, 2)[:B].reshape(B, C * Z) < 0)
        ok = ok_bz[:B, 0].astype(jnp.float32) > 0
        return bits[:, : g.K].astype(jnp.int8), ok
    sb = 16 if sb is None else sb
    if msg_dtype == jnp.int8:
        from ..phy.llr import quantize
        x = quantize(llr.astype(jnp.float32), bits=8).astype(jnp.int32)
        in_dtype = jnp.int32
    elif msg_dtype == jnp.bfloat16:
        # clip so layered totals stay within bf16's near-exact small-int
        # range (same spirit as the reference's int8 saturation)
        x = jnp.clip(llr.astype(jnp.float32), -24.0, 24.0).astype(jnp.bfloat16)
        in_dtype = jnp.bfloat16
    else:
        x = llr if llr.dtype in (jnp.float32, jnp.bfloat16) \
            else llr.astype(jnp.float32)
        in_dtype = x.dtype
    if Z % 128 == 0:
        # flat B-major layout: the (B, cols*Z) rate-matched buffer IS the
        # kernel input — no transposes either way
        run, g = _build_decoder(graph.bg, graph.Z, n_iters, alpha, schedule,
                                sb, msg_dtype, check_every, debug_noroll,
                                layout="flat", in_dtype=in_dtype)
        Bp = -(-B // sb) * sb
        if Bp != B:
            x = jnp.concatenate(
                [x, jnp.zeros((Bp - B, C * Z), x.dtype)], axis=0)
        bits_flat, ok_bz = run(x)
        bits = bits_flat[:B].astype(jnp.int8)
        ok = ok_bz[:B, 0] != 0
        return bits[:, : g.K], ok
    run, g = _build_decoder(graph.bg, graph.Z, n_iters, alpha, schedule, sb,
                            msg_dtype, check_every, debug_noroll,
                            in_dtype=in_dtype)
    Bp = -(-B // sb) * sb
    x = x.astype(jnp.float32) if msg_dtype == jnp.float32 else x
    x = x.reshape(B, C, Z)
    if Bp != B:
        x = jnp.concatenate([x, jnp.zeros((Bp - B, C, Z), x.dtype)], axis=0)
    x = x.transpose(1, 0, 2)                      # (C, Bp, Z)
    bits_cbz, ok_bz = run(x)
    bits_cbz = bits_cbz.astype(jnp.int8)   # no-op except bf16 path
    bits = bits_cbz.transpose(1, 0, 2)[:B].reshape(B, C * Z)
    ok = ok_bz[:B, 0] != 0                        # flag replicated on lanes
    return bits[:, : g.K], ok


