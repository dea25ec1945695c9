#!/usr/bin/env python3
"""LDPC Pallas kernel experiments on the real chip.

Times decoder variants with the scan-over-distinct-inputs methodology
(docs/PERF.md). Usage: python tools/bench_ldpc_kernel.py --variants f32,bf16
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--cbs", type=int, default=64)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--Z", type=int, default=384)
    ap.add_argument("--bg", type=int, default=1)
    ap.add_argument("--variants", default="f32")
    ap.add_argument("--check-every", type=int, default=0)
    ap.add_argument("--snr", type=float, default=4.0,
                    help="Es/N0 dB for realistic convergent LLRs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openairinterface5g_tpu.coding import ldpc
    from openairinterface5g_tpu.ops import ldpc_pallas

    g = ldpc.build_graph(args.bg, args.Z)
    K = g.K
    B, R = args.cbs, args.reps
    rng = np.random.default_rng(0)

    # realistic LLRs: encode random CBs, BPSK + AWGN at --snr (rate 1/3 full cw)
    bits = rng.integers(0, 2, (B, K)).astype(np.int8)
    cw = np.asarray(ldpc.encode(g, jnp.asarray(bits)))
    x = 1.0 - 2.0 * cw.astype(np.float32)
    sigma2 = 10 ** (-args.snr / 10)
    llrs_list = []
    for i in range(R):
        n = rng.normal(0, np.sqrt(sigma2), cw.shape).astype(np.float32)
        llr = 2.0 * (x + n) / sigma2
        # first 2Z punctured as in NR
        llrs_list.append(np.clip(llr, -24, 24))
    llrs = jnp.asarray(np.stack(llrs_list))
    info_bits = B * K

    for variant in args.variants.split(","):
        parts = variant.split(":")
        msg_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                     "int8": jnp.int8}[parts[0]]
        kw = dict(n_iters=args.iters, msg_dtype=msg_dtype,
                  check_every=args.check_every)
        if "noroll" in parts:
            kw["debug_noroll"] = True
        for p in parts:
            if p.startswith("sb"):
                kw["sb"] = int(p[2:])

        def fn(l):
            bits_d, ok = ldpc_pallas.decode_pallas(g, l, **kw)
            return jnp.sum(bits_d.astype(jnp.int32)), jnp.sum(ok)

        @jax.jit
        def scan_all(xs):
            def body(c, l):
                s, ok = fn(l)
                return c + s + ok, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return c

        def timed(xs):
            out = scan_all(xs)
            _ = int(np.asarray(out))
            t0 = time.perf_counter()
            out = scan_all(xs)
            _ = int(np.asarray(out))
            return time.perf_counter() - t0

        try:
            # slope over two rep counts: the tunnel's fixed ~30 ms
            # dispatch+fetch cancels (a plain total/R divide inflated
            # per-rep time ~4x at small R — docs/PERF.md methodology)
            r1 = max(2, R // 4)
            t1 = timed(llrs[:r1])
            t2 = timed(llrs)
        except Exception as e:
            print(f"{variant:14s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            continue
        per = (t2 - t1) / (R - r1)
        # correctness (not for noroll)
        bits_d, ok = jax.jit(fn)(llrs[0])
        n_ok = int(np.asarray(ok))
        print(f"{variant:14s} {per*1e3:8.2f} ms/{B}cb  "
              f"{info_bits/per/1e6:8.1f} Mbps info   ok={n_ok}/{B}")


if __name__ == "__main__":
    main()
