#!/usr/bin/env python3
"""Isolate the slow op inside scramble+modulate+layer_map."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, xs, label, n1=8, n2=24):
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

    def run(sub):
        out = scan_all(sub)
        _ = float(np.asarray(out))
        t0 = time.perf_counter()
        out = scan_all(sub)
        _ = float(np.asarray(out))
        return time.perf_counter() - t0

    t1 = run(jax.tree.map(lambda a: a[:n1], xs))
    t2 = run(jax.tree.map(lambda a: a[:n2], xs))
    per = (t2 - t1) / (n2 - n1)
    print(f"{label:52s} {per*1e3:8.3f} ms/step", flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openairinterface5g_tpu.phy import modulation as mod
    from openairinterface5g_tpu.phy.scrambling import pusch_cinit, scramble

    B, G, qm, L = 8, 340704, 4, 2
    R = 24
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, size=(R, B, G)).astype(np.int8))
    cinit = pusch_cinit(0x1234, 0, 0)

    timed(lambda b: scramble(b, cinit), bits, "scramble only")
    timed(lambda b: mod.modulate(b, qm), bits, "modulate (take gather)")

    def mod_arith(b):
        # bit planes via reshape+slice; arithmetic constellation (16QAM)
        g = b.reshape(B, G // qm, qm).astype(jnp.float32)
        s0 = 1 - 2 * g[..., 0]
        s1 = 1 - 2 * g[..., 1]
        s2 = 1 - 2 * g[..., 2]
        s3 = 1 - 2 * g[..., 3]
        re = s0 * (2 - s2) * np.float32(1 / np.sqrt(10))
        im = s1 * (2 - s3) * np.float32(1 / np.sqrt(10))
        return jax.lax.complex(re, im)
    timed(mod_arith, bits, "modulate (arithmetic, no gather)")

    def mod_onehot(b):
        g = b.reshape(B, G // qm, qm).astype(jnp.int32)
        w = jnp.asarray(1 << np.arange(qm - 1, -1, -1), dtype=jnp.int32)
        idx = jnp.sum(g * w, axis=-1)
        oh = jax.nn.one_hot(idx, 1 << qm, dtype=jnp.float32)
        tab = np.asarray(mod.constellation(qm))
        re = oh @ jnp.asarray(tab.real)
        im = oh @ jnp.asarray(tab.imag)
        return jax.lax.complex(re, im)
    timed(mod_onehot, bits, "modulate (one-hot matmul)")

    re_h = jnp.asarray(rng.standard_normal((R, B, G // qm)).astype(np.float32))
    im_h = jnp.asarray(rng.standard_normal((R, B, G // qm)).astype(np.float32))
    syms = jax.jit(jax.lax.complex)(re_h, im_h)
    timed(lambda s: mod.layer_map(s, L), syms, "layer_map only")

    def full_arith(b):
        sc = scramble(b, cinit)
        s = mod_arith(sc)
        return mod.layer_map(s, L)
    timed(full_arith, bits, "scramble+arith-mod+layer_map")


if __name__ == "__main__":
    main()
