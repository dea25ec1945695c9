#!/usr/bin/env python3
"""Minimal-repro bisect for the B>=32 two-HARQ-round TPU worker crash.

Each --case runs ONE candidate graph in this process; run sequentially in
separate OS processes (the crash kills the worker; it restarts ~1 min).

Config under test: 106 PRB MCS20 2-DMRS 2x2 (the conformance point shape).
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--backend", default="pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openairinterface5g_tpu.models.pusch import (
        PuschConfig, pusch_rx, pusch_tx, pusch_rx_grid)
    from openairinterface5g_tpu.coding import ldpc
    from openairinterface5g_tpu.ops import ldpc_pallas

    cfg = PuschConfig(mu=1, n_prb=106, mcs=20, n_layers=1, n_rx=2,
                      dmrs_symbols=(2, 11), chest_window=16,
                      decoder_backend=args.backend)
    p, _ = cfg.seg_params()
    B = args.batch
    print(f"case={args.case} B={B} TBS={cfg.tbs} C={p.C} Z={p.Z} BG={p.bg}",
          flush=True)
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, (B, cfg.tbs)).astype(np.int8))

    if args.case == "decode2":
        # two chained pallas decodes (flat layout), add between
        g = ldpc.build_graph(p.bg, p.Z)
        llr = jnp.asarray(rng.normal(size=(B * p.C, g.cols * p.Z))
                          .astype(np.float32))

        @jax.jit
        def f(x):
            b1, ok1 = ldpc_pallas.decode_pallas(g, x, n_iters=7, sb=8)
            x2 = x + b1.astype(jnp.float32).sum() * 0 + 0.1
            b2, ok2 = ldpc_pallas.decode_pallas(g, x2, n_iters=7, sb=8)
            return ok1.sum() + ok2.sum()
        print("result", f(llr), flush=True)
    elif args.case == "rx2":
        # two chained full pusch_rx with HARQ combine (the ulsim shape)
        @jax.jit
        def f(t):
            tx, _ = pusch_tx(cfg, t, rv=0)
            rx = tx + 0.05
            o1 = pusch_rx(cfg, rx, rv=0, n_iters=7)
            tx2, _ = pusch_tx(cfg, t, rv=2)
            o2 = pusch_rx(cfg, tx2 + 0.05, rv=2, n_iters=7,
                          harq_buffers=o1["harq_buffers"])
            return o1["tb_ok"].sum() + o2["tb_ok"].sum()
        print("result", f(tb), flush=True)
    elif args.case == "rx2nh":
        # two chained pusch_rx WITHOUT harq combining
        @jax.jit
        def f(t):
            tx, _ = pusch_tx(cfg, t, rv=0)
            o1 = pusch_rx(cfg, tx + 0.05, rv=0, n_iters=7)
            tx2, _ = pusch_tx(cfg, t, rv=2)
            o2 = pusch_rx(cfg, tx2 + 0.05, rv=2, n_iters=7)
            return o1["tb_ok"].sum() + o2["tb_ok"].sum()
        print("result", f(tb), flush=True)
    elif args.case == "rx1":
        @jax.jit
        def f(t):
            tx, _ = pusch_tx(cfg, t, rv=0)
            o1 = pusch_rx(cfg, tx + 0.05, rv=0, n_iters=7)
            return o1["tb_ok"].sum()
        print("result", f(tb), flush=True)
    elif args.case == "ulsimstep":
        # ulsim's exact jitted step (TDLA channel + 2 HARQ rounds)
        from openairinterface5g_tpu.sim.ulsim import build_step
        step = build_step(cfg, max_rounds=2, n_iters=7, channel_name="TDLA",
                          delay_spread_ns=10.0)
        for i in range(3):
            oks = step(jax.random.PRNGKey(i), tb, jnp.float32(12.4))
            print("invocation", i, np.asarray(oks).sum(), flush=True)
    elif args.case == "chan2":
        # channel model + noise, two rounds, decode replaced by sum
        from openairinterface5g_tpu.sim.channel import (ChannelModel,
                                                        add_noise,
                                                        apply_channel)
        model = ChannelModel("TDLA", cfg.n_layers, cfg.n_rx,
                             cfg.fp.sample_rate, delay_spread_ns=10.0)

        @jax.jit
        def f(key, t):
            acc = jnp.float32(0)
            harq = None
            for r, rv in enumerate((0, 2)):
                key, k1, k2 = jax.random.split(key, 3)
                tx, _ = pusch_tx(cfg, t, rv=rv)
                rx, _ = apply_channel(model, k1, tx)
                rx = add_noise(k2, rx, jnp.float32(0.01))
                out = pusch_rx(cfg, rx, rv=rv, n_iters=7, harq_buffers=harq)
                harq = out["harq_buffers"]
                acc = acc + out["tb_ok"].sum()
            return acc
        print("result", f(jax.random.PRNGKey(0), tb), flush=True)
    elif args.case in ("xdec2-while", "xdec2-fori", "xdec1-while"):
        # chained XLA flooding decodes; while = early_stop lax.while_loop
        g = ldpc.build_graph(p.bg, p.Z)
        es = args.case.endswith("while")
        n = 1 if "xdec1" in args.case else 2
        llr = jnp.asarray(rng.normal(size=(B * p.C, g.cols * p.Z))
                          .astype(np.float32))

        @jax.jit
        def f(x):
            acc = jnp.int32(0)
            for i in range(n):
                bits, ok, _ = ldpc.decode(g, x + jnp.float32(i),
                                          n_iters=7, early_stop=es)
                acc = acc + ok.sum() + bits.sum().astype(jnp.int32) * 0
            return acc
        print("result", f(llr), flush=True)
    else:
        raise SystemExit(f"unknown case {args.case}")
    print("CASE SURVIVED", flush=True)


if __name__ == "__main__":
    main()
