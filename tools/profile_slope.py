#!/usr/bin/env python3
"""Slope-based per-stage timing of the bench PUSCH RX config.

Times each stage as a scan over R1 and R2 distinct inputs and reports
(t2 - t1) / (R2 - R1): the marginal per-step device time, free of the
fixed dispatch/fetch overhead that plagued the subtraction method in
profile_stages.py (docs/PERF.md).
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def slope_timed(fn, xs_small, xs_big, label):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scan_all(xs):
        def body(c, x):
            r = fn(x)
            s = sum(jnp.sum(jnp.abs(v).astype(jnp.float32))
                    if hasattr(v, "astype") else 0.0
                    for v in jax.tree.leaves(r))
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return c

    def run(xs):
        out = scan_all(xs)
        _ = float(np.asarray(out))
        t0 = time.perf_counter()
        out = scan_all(xs)
        _ = float(np.asarray(out))
        return time.perf_counter() - t0

    t1 = run(xs_small)
    t2 = run(xs_big)
    n1 = jax.tree.leaves(xs_small)[0].shape[0]
    n2 = jax.tree.leaves(xs_big)[0].shape[0]
    per = (t2 - t1) / (n2 - n1)
    print(f"{label:44s} {per*1e3:8.3f} ms/step  "
          f"(t{n1}={t1*1e3:.1f} t{n2}={t2*1e3:.1f} ms)")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r1", type=int, default=8)
    ap.add_argument("--r2", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openairinterface5g_tpu.models.pusch import (
        PuschConfig, pusch_tx, pusch_frontend, pusch_rx)
    from openairinterface5g_tpu.phy.ofdm import ofdm_demodulate, extract_from_grid
    from openairinterface5g_tpu.coding import ldpc, rate_matching
    from openairinterface5g_tpu.coding.backend import decoder as ldpc_decoder

    cfg = PuschConfig(mu=1, n_prb=273, mcs=16, n_layers=2, n_rx=2,
                      decoder_backend="pallas", decoder_first_iters=4)
    B = args.batch
    p, crc_name = cfg.seg_params()
    fp = cfg.fp
    print(f"cfg: TBS={cfg.tbs} C={p.C} K={p.K} Z={p.Z} BG={p.bg} G={cfg.G} B={B}")

    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, size=(B, cfg.tbs)).astype(np.int8))

    @jax.jit
    def make_rx(key):
        tx, _ = pusch_tx(cfg, tb)
        noise = 0.05 * (jax.random.normal(key, tx.shape)
                        + 1j * jax.random.normal(jax.random.fold_in(key, 1), tx.shape))
        return tx + 0.1 * tx[:, ::-1, :] + noise.astype(jnp.complex64)

    def stack(make, n, base=0):
        return jax.block_until_ready(jnp.stack([make(i + base) for i in range(n)]))

    rxs1 = stack(lambda i: make_rx(jax.random.PRNGKey(i)), args.r1)
    rxs2 = stack(lambda i: make_rx(jax.random.PRNGKey(i)), args.r2, 100)

    @jax.jit
    def to_grid(r):
        return extract_from_grid(fp, ofdm_demodulate(fp, r, cfg.slot))
    grids1 = stack(lambda i: to_grid(rxs1[i]), args.r1)
    grids2 = stack(lambda i: to_grid(rxs2[i]), args.r2)

    @jax.jit
    def to_llr(g):
        return pusch_frontend(cfg, g)
    llrs1 = stack(lambda i: to_llr(grids1[i]), args.r1)
    llrs2 = stack(lambda i: to_llr(grids2[i]), args.r2)

    g_l = ldpc.build_graph(p.bg, p.Z)
    es = cfg.cb_e_sizes()
    qm = cfg.qm_rate[0]

    @jax.jit
    def to_stacked(l):
        return rate_matching.fused_rate_match_rx(g_l, l, 0, tuple(es), qm, p.F)
    st1 = stack(lambda i: to_stacked(llrs1[i]), args.r1)
    st2 = stack(lambda i: to_stacked(llrs2[i]), args.r2)

    stages = args.stages.split(",") if args.stages != "all" else [
        "e2e", "ofdm", "frontend", "rm", "decode", "decode8"]

    if "e2e" in stages:
        slope_timed(lambda r: pusch_rx(cfg, r, n_iters=8)["tb_ok"],
                    rxs1, rxs2, "FULL pusch_rx (first_iters=4)")
    if "ofdm" in stages:
        slope_timed(to_grid, rxs1, rxs2, "ofdm_demod + extract")
    if "frontend" in stages:
        slope_timed(to_llr, grids1, grids2, "frontend (chest+eq+llr+descr)")
    if "rm" in stages:
        slope_timed(to_stacked, llrs1, llrs2, "fused_rate_match_rx")
    if "decode" in stages:
        slope_timed(lambda s: ldpc_decoder("pallas")(
            g_l, s.reshape(B * p.C, -1), n_iters=8, first_iters=4),
            st1, st2, "pallas decode first4/8")
    if "decode8" in stages:
        slope_timed(lambda s: ldpc_decoder("pallas")(
            g_l, s.reshape(B * p.C, -1), n_iters=8),
            st1, st2, "pallas decode flat 8it")


if __name__ == "__main__":
    main()
