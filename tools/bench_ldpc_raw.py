#!/usr/bin/env python3
"""Raw pallas LDPC kernel timing: isolates kernel vs wrapper (layout) cost.

Feeds pre-layouted (C, Bp, Z) tensors straight into the pallas_call
returned by _build_decoder, no transposes/padding/sums beyond a scalar
fold. Scans over distinct inputs (docs/PERF.md methodology).
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--cbs", default="16,32,64,104")
    ap.add_argument("--iters", default="8")
    ap.add_argument("--sb", type=int, default=16)
    ap.add_argument("--Z", type=int, default=384)
    ap.add_argument("--bg", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openairinterface5g_tpu.coding import ldpc
    from openairinterface5g_tpu.ops.ldpc_pallas import _build_decoder

    g = ldpc.build_graph(args.bg, args.Z)
    C, Z, K = g.cols, g.Z, g.K
    rng = np.random.default_rng(0)
    R = args.reps

    for n_it in (int(x) for x in args.iters.split(",")):
        run, _ = _build_decoder(args.bg, args.Z, n_it, 0.8125, "layered",
                                args.sb, jnp.float32, 0, False)
        for ncb in (int(x) for x in args.cbs.split(",")):
            Bp = -(-ncb // args.sb) * args.sb
            x = rng.normal(size=(R, C, Bp, Z)).astype(np.float32) * 8
            xs = jnp.asarray(x)

            @jax.jit
            def scan_all(xs):
                def body(c, l):
                    bits, ok = run(l)
                    return c + jnp.sum(ok.astype(jnp.int32)) + jnp.sum(bits.astype(jnp.int32)), ()
                c, _ = jax.lax.scan(body, jnp.int32(0), xs)
                return c

            out = scan_all(xs)
            _ = int(np.asarray(out))
            t0 = time.perf_counter()
            _ = int(np.asarray(scan_all(xs)))
            dt = time.perf_counter() - t0
            per = dt / R
            print(f"raw sb={args.sb} iters={n_it} cbs={Bp}:"
                  f" {per*1e3:8.2f} ms  {Bp*K/per/1e6:8.1f} Mbps info")


if __name__ == "__main__":
    main()
