#!/usr/bin/env python3
"""Calibrate the axon tunnel's fixed dispatch+fetch latency vs per-step cost.

Runs a trivial scan and the LDPC/RX workloads at several scan lengths R.
If time/step falls as R grows, the overhead is a one-time roundtrip; the
asymptote is the true device throughput.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def run_scan(f, xs, label, R):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scan_all(xs):
        def body(c, x):
            return c + f(x), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c

    out = scan_all(xs)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    _ = float(np.asarray(scan_all(xs)))
    dt = time.perf_counter() - t0
    print(f"{label:40s} R={R:3d}  total {dt*1e3:8.2f} ms   {dt/R*1e3:8.3f} ms/step")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="trivial")
    ap.add_argument("--rs", default="8,32,64")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    Rs = [int(x) for x in args.rs.split(",")]

    if args.what == "trivial":
        for R in Rs:
            xs = jnp.asarray(rng.normal(size=(R, 128, 128)).astype(np.float32))
            run_scan(lambda x: jnp.sum(x * 2.0 + 1.0), xs, "trivial scan (16k f32)", R)

    if args.what == "ldpc":
        from openairinterface5g_tpu.coding import ldpc
        from openairinterface5g_tpu.ops.ldpc_pallas import _build_decoder
        g = ldpc.build_graph(1, 384)
        run, _ = _build_decoder(1, 384, 8, 0.8125, "layered", 16,
                                jnp.float32, 0, False)

        def f(l):
            bits, ok = run(l)
            return (jnp.sum(ok.astype(jnp.float32))
                    + jnp.sum(bits.astype(jnp.float32)))
        for R in Rs:
            xs = jnp.asarray(rng.normal(size=(R, g.cols, 112, 384)).astype(np.float32) * 8)
            dt = run_scan(f, xs, "ldpc raw 112cb 8it", R)
        K = g.K
        print(f"  asymptotic: {112*K*Rs[-1]/dt/1e6:.0f} Mbps info")

    if args.what == "rx":
        from openairinterface5g_tpu.models.pusch import PuschConfig, pusch_rx, pusch_tx
        cfg = PuschConfig(mu=1, n_prb=273, mcs=16, n_layers=2, n_rx=2,
                          decoder_backend="pallas", decoder_first_iters=4)
        B = 4
        tb = jnp.asarray(rng.integers(0, 2, size=(B, cfg.tbs)).astype(np.int8))

        @jax.jit
        def make_rx(key):
            tx, _ = pusch_tx(cfg, tb)
            noise = 0.05 * (jax.random.normal(key, tx.shape)
                            + 1j * jax.random.normal(jax.random.fold_in(key, 1), tx.shape))
            return tx + 0.1 * tx[:, ::-1, :] + noise.astype(jnp.complex64)

        def f(r):
            return jnp.sum(pusch_rx(cfg, r, n_iters=8)["tb_ok"].astype(jnp.float32))
        for R in Rs:
            xs = jax.block_until_ready(
                jnp.stack([make_rx(jax.random.PRNGKey(i)) for i in range(R)]))
            dt = run_scan(f, xs, f"full RX B={B} first4", R)
        print(f"  asymptotic: {B*Rs[-1]/dt:.0f} slots/s")


if __name__ == "__main__":
    main()
