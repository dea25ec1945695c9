#!/usr/bin/env python3
"""Isolate fixed dispatch/step overheads on the axon platform.

a) trivial XLA scan step (no pallas): per-step cost of scan itself
b) tiny pallas kernel in a scan: per-pallas_call fixed cost
c) LDPC kernel, R=1 (single call, no scan): end-to-end single dispatch
d) two pallas calls per scan step: does overhead double?
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    R = 8
    rng = np.random.default_rng(0)

    def timeit(label, f, xs):
        out = f(xs)
        _ = float(np.asarray(out))
        t0 = time.perf_counter()
        _ = float(np.asarray(f(xs)))
        dt = time.perf_counter() - t0
        print(f"{label:46s} {dt/R*1e3:8.3f} ms/step")

    # a) trivial scan
    xs = jnp.asarray(rng.normal(size=(R, 1024, 1024)).astype(np.float32))

    @jax.jit
    def triv(xs):
        def body(c, x):
            return c + jnp.sum(x * 2.0 + 1.0), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c
    timeit("a trivial scan (1M f32 elementwise)", triv, xs)

    # b) tiny pallas kernel per scan step
    def tiny_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    def tiny(x):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    xs_t = jnp.asarray(rng.normal(size=(R, 8, 128)).astype(np.float32))

    @jax.jit
    def scan_tiny(xs):
        def body(c, x):
            return c + jnp.sum(tiny(x)), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c
    timeit("b tiny pallas in scan", scan_tiny, xs_t)

    # d) two tiny pallas calls per step
    @jax.jit
    def scan_tiny2(xs):
        def body(c, x):
            return c + jnp.sum(tiny(x)) + jnp.sum(tiny(x + 1.0)), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c
    timeit("d two tiny pallas in scan", scan_tiny2, xs_t)

    # e) tiny pallas with grid=8
    def tiny_grid(x):
        return pl.pallas_call(
            tiny_kernel,
            grid=(8,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.float32),
        )(x)

    xs_g = jnp.asarray(rng.normal(size=(R, 8, 8, 128)).astype(np.float32))

    @jax.jit
    def scan_grid(xs):
        def body(c, x):
            return c + jnp.sum(tiny_grid(x)), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c
    timeit("e tiny pallas grid=8 in scan", scan_grid, xs_g)

    # c) LDPC kernel single dispatch (no scan), R pipelined calls
    from openairinterface5g_tpu.coding import ldpc
    from openairinterface5g_tpu.ops.ldpc_pallas import _build_decoder
    g = ldpc.build_graph(1, 384)
    run, _ = _build_decoder(1, 384, 8, 0.8125, "layered", 16,
                            jnp.float32, 0, False)

    @jax.jit
    def one(l):
        bits, ok = run(l)
        return jnp.sum(ok.astype(jnp.int32)) + jnp.sum(bits.astype(jnp.int32))

    ls = [jnp.asarray(rng.normal(size=(g.cols, 112, 384)).astype(np.float32) * 8)
          for _ in range(R)]
    outs = [one(l) for l in ls]  # compile+warm
    _ = [int(np.asarray(o)) for o in outs]
    t0 = time.perf_counter()
    outs = [one(l) for l in ls]
    _ = [int(np.asarray(o)) for o in outs]
    dt = time.perf_counter() - t0
    print(f"{'c ldpc 112cb x8it pipelined dispatch':46s} {dt/R*1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
