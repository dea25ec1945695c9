#!/usr/bin/env python3
"""Compare the 'col' vs 'flat' Pallas decoder I/O layouts (raw kernel)."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from openairinterface5g_tpu.coding import ldpc
    from openairinterface5g_tpu.ops import ldpc_pallas

    bg, Z, B, iters, sb = 1, 384, 128, 8, 16
    g = ldpc.build_graph(bg, Z)
    C = g.cols
    rng = np.random.default_rng(0)
    R = 6
    info = rng.integers(0, 2, (B, g.K)).astype(np.int8)
    cw = np.asarray(ldpc.encode(g, jnp.asarray(info)))
    llr0 = (1.0 - 2.0 * cw) * 4.0 + rng.normal(size=cw.shape) * 1.0
    R2 = 30
    llrs = jnp.asarray(np.stack([llr0 + 0.01 * i for i in range(R2)])
                       .astype(np.float32))

    for layout in ("flat", "col"):
        run, _ = ldpc_pallas._build_decoder(bg, Z, iters, 0.8125, "layered",
                                            sb, jnp.float32, 0, False,
                                            layout=layout)

        if layout == "flat":
            def prep(l):
                return l
        else:
            def prep(l):
                return l.reshape(B, C, Z).transpose(1, 0, 2)

        @jax.jit
        def scan_all(xs):
            def body(c, l):
                bits, ok = run(prep(l))
                return c + jnp.sum(ok.astype(jnp.int32)), ()
            c, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return c

        def run_timed(xs):
            out = scan_all(xs)
            _ = int(np.asarray(out))
            t0 = time.perf_counter()
            out = scan_all(xs)
            n = int(np.asarray(out))
            return time.perf_counter() - t0, n

        t1, _ = run_timed(llrs[:R])
        t2, n = run_timed(llrs)
        dt = (t2 - t1) / (R2 - R)          # slope: tunnel cost cancels
        mbps = B * g.K / dt / 1e6
        print(f"{layout}: {dt*1e3:.2f} ms/{B}cb  {mbps:.1f} Mbps info  "
              f"(ok count {n})", flush=True)


if __name__ == "__main__":
    main()
