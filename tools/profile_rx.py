#!/usr/bin/env python3
"""Component-level timing of the bench PUSCH RX config on the real chip.

Methodology (docs/PERF.md): the axon tunnel elides repeated identical
executions, so each timed repetition is one step of a lax.scan over
DISTINCT device-resident inputs inside a single jitted program — one
dispatch, one tiny host fetch as the completion barrier.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, xs, label, work_per_step):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scan_all(xs):
        def body(c, x):
            r = fn(x)
            # fold a scalar out of the result so nothing big is fetched
            s = sum(jnp.sum(v.astype(jnp.float32)) if hasattr(v, "astype") else 0.0
                    for v in jax.tree.leaves(r))
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return c

    out = scan_all(xs)           # compile + run
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    out = scan_all(xs)
    _ = float(np.asarray(out))
    dt = time.perf_counter() - t0
    n = jax.tree.leaves(xs)[0].shape[0]
    per = dt / n
    print(f"{label:42s} {per*1e3:8.3f} ms/step  "
          f"{work_per_step/per/1e6 if work_per_step else 0:9.1f} work-units/s")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--what", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openairinterface5g_tpu.models.pusch import PuschConfig, pusch_rx, pusch_tx
    from openairinterface5g_tpu.coding import ldpc
    from openairinterface5g_tpu.ops.ldpc_pallas import decode_pallas

    cfg = PuschConfig(mu=1, n_prb=273, mcs=16, n_layers=2, n_rx=2,
                      decoder_backend="pallas")
    B, R = args.batch, args.reps
    p, _ = cfg.seg_params()
    print(f"cfg: TBS={cfg.tbs} C={p.C} K={p.K} Z={p.Z} BG={p.bg} G={cfg.G}")

    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, size=(B, cfg.tbs)).astype(np.int8))

    @jax.jit
    def make_rx(key):
        tx, _ = pusch_tx(cfg, tb)
        noise = 0.05 * (jax.random.normal(key, tx.shape)
                        + 1j * jax.random.normal(jax.random.fold_in(key, 1), tx.shape))
        return tx + 0.1 * tx[:, ::-1, :] + noise.astype(jnp.complex64)

    rxs = jnp.stack([make_rx(jax.random.PRNGKey(i)) for i in range(R)])
    rxs = jax.block_until_ready(rxs)

    if args.what in ("all", "full"):
        per = timed(lambda r: pusch_rx(cfg, r, n_iters=8)["tb_ok"], rxs,
                    f"full RX (B={B}, pallas 8it)", B)
        print(f"  -> {B/per:.0f} slots/s")

    if args.what in ("all", "front"):
        from openairinterface5g_tpu.models.pusch import pusch_frontend
        from openairinterface5g_tpu.phy.ofdm import ofdm_demodulate, extract_from_grid

        def front(r):
            grid = ofdm_demodulate(cfg.fp, r, cfg.slot)
            re_grid = extract_from_grid(cfg.fp, grid)
            return pusch_frontend(cfg, re_grid)
        per = timed(front, rxs, f"front-end to LLR (B={B})", B)
        print(f"  -> {B/per:.0f} slots/s front-end only")

    if args.what in ("all", "dec"):
        g = ldpc.build_graph(p.bg, p.Z)
        nllr = B * p.C
        llr = jnp.asarray(rng.normal(size=(nllr, g.cols * p.Z)).astype(np.float32) * 8)
        llrs = jnp.stack([llr + i * 0.001 for i in range(R)])
        info_bits = nllr * p.K
        for iters in (4, 6, 8):
            per = timed(lambda l, it=iters: decode_pallas(g, l, n_iters=it)[0],
                        llrs, f"pallas decode {nllr}cb x{iters}it", info_bits)
            print(f"  -> {info_bits/per/1e6:.0f} Mbps info")


if __name__ == "__main__":
    main()
