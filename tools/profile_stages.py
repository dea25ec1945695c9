#!/usr/bin/env python3
"""Per-stage timing of the bench PUSCH RX config on the real chip.

Finer-grained than profile_rx.py: times OFDM demod, channel estimation,
equalization, LLR+descramble, rate-match recovery, LDPC decode, and the
CRC epilogue separately, each with the scan-over-distinct-inputs
methodology (docs/PERF.md).
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, xs, label):
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

    out = scan_all(xs)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    out = scan_all(xs)
    _ = float(np.asarray(out))
    dt = time.perf_counter() - t0
    n = jax.tree.leaves(xs)[0].shape[0]
    # ~26 ms of every dispatch+fetch is axon tunnel roundtrip (measured by
    # tools/bench_overhead.py) — report the overhead-corrected per-step time
    per = max(dt - 0.026, 1e-9) / n
    print(f"{label:44s} {per*1e3:8.3f} ms/step  (total {dt*1e3:.1f} ms)")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openairinterface5g_tpu.models.pusch import (
        PuschConfig, pusch_tx, pusch_channel_estimate, pusch_equalize,
        pusch_llrs, pusch_frontend)
    from openairinterface5g_tpu.phy.ofdm import ofdm_demodulate, extract_from_grid
    from openairinterface5g_tpu.coding import ldpc, rate_matching, segmentation
    from openairinterface5g_tpu.coding.crc import crc_ok

    cfg = PuschConfig(mu=1, n_prb=273, mcs=16, n_layers=2, n_rx=2,
                      decoder_backend="pallas")
    B, R = args.batch, args.reps
    p, crc_name = cfg.seg_params()
    fp = cfg.fp
    print(f"cfg: TBS={cfg.tbs} C={p.C} K={p.K} Z={p.Z} BG={p.bg} G={cfg.G}")

    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, size=(B, cfg.tbs)).astype(np.int8))

    @jax.jit
    def make_rx(key):
        tx, _ = pusch_tx(cfg, tb)
        noise = 0.05 * (jax.random.normal(key, tx.shape)
                        + 1j * jax.random.normal(jax.random.fold_in(key, 1), tx.shape))
        return tx + 0.1 * tx[:, ::-1, :] + noise.astype(jnp.complex64)

    rxs = jax.block_until_ready(jnp.stack([make_rx(jax.random.PRNGKey(i)) for i in range(R)]))

    # stage inputs
    @jax.jit
    def to_grid(r):
        return extract_from_grid(fp, ofdm_demodulate(fp, r, cfg.slot))
    grids = jax.block_until_ready(jnp.stack([to_grid(r) for r in rxs]))

    @jax.jit
    def to_llr(g):
        return pusch_frontend(cfg, g)
    llrs = jax.block_until_ready(jnp.stack([to_llr(g) for g in grids]))

    g_l = ldpc.build_graph(p.bg, p.Z)
    es = cfg.cb_e_sizes()
    qm = cfg.qm_rate[0]

    @jax.jit
    def to_stacked(l):
        return rate_matching.fused_rate_match_rx(g_l, l, 0, tuple(es), qm, p.F)
    stackeds = jax.block_until_ready(jnp.stack([to_stacked(l) for l in llrs]))

    timed(lambda r: ofdm_demodulate(fp, r, cfg.slot), rxs,
          f"1 ofdm_demodulate (B={B})")
    timed(to_grid, rxs, f"1b  + extract_from_grid")
    timed(lambda g: pusch_channel_estimate(cfg, g), grids,
          "2 channel estimate")

    def eq_fn(g):
        h, nv = pusch_channel_estimate(cfg, g)
        return pusch_equalize(cfg, g, h, nv)
    timed(eq_fn, grids, "3 chanest + equalize")
    timed(to_llr, grids, "4 full frontend (chest+eq+llr+descr)")
    timed(to_stacked, llrs, "5 fused_rate_match_rx")

    from openairinterface5g_tpu.coding.backend import decoder as ldpc_decoder

    def dec_fn(s):
        return ldpc_decoder("pallas")(g_l, s.reshape(B * p.C, -1), n_iters=8)
    timed(dec_fn, stackeds, "6 pallas decode 8it")

    def epi_fn(s):
        bits_all, ok_all = ldpc_decoder("pallas")(g_l, s.reshape(B * p.C, -1), n_iters=8)
        cbs = bits_all.reshape(B, p.C, -1)
        tbw = segmentation.desegment_tb(cbs, p)
        return crc_ok(tbw, crc_name)
    timed(epi_fn, stackeds, "7 decode + deseg + CRC")


if __name__ == "__main__":
    main()
