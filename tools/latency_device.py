#!/usr/bin/env python3
"""Device-side sustained per-slot latency (no tunnel in the timed path).

Replaces the round-4 host-loop numbers (which measured the ~30 ms axon
tunnel roundtrip, 60/60 'misses') with what a production deployment with
local dispatch pays: every timed region is ONE device program over
distinct device-resident slots; the tunnel cost cancels in the slope.

Measurements at B=1 (true per-slot, the softmodem operating shape), 273
PRB MCS16 2x2, fused Pallas frontend + in-kernel-ET pallas decode:

  1) sustained mean: (t(128-slot scan) - t(32-slot scan)) / 96
  2) jitter distribution: K samples of 8-slot windows
     (t(12 slots) - t(4 slots)) / 8 -> p50/p90/p99 across windows
     (per-slot tails inside a window are not observable without
     per-slot host fetches, which would re-introduce the tunnel; an
     8-slot window bounds jitter at the depth-2 pipeline scale)
  3) the same for the COMBINED DL-TX + UL-RX slot

Writes LATENCY_r05.txt with --write.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openairinterface5g_tpu.models.pusch import (PuschConfig, pusch_rx,
                                                     pusch_tx, pusch_tx_grid)
    from openairinterface5g_tpu.models.pdsch import PdschConfig
    from openairinterface5g_tpu.phy.ofdm import map_to_grid, ofdm_modulate

    cfg = PuschConfig(mu=1, n_prb=273, mcs=16, n_layers=2, n_rx=2,
                      decoder_backend="pallas", decoder_check_every=2)
    dl = PdschConfig(mu=1, n_prb=273, mcs=16, n_layers=2)
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, (1, cfg.tbs)).astype(np.int8))
    tb_dl = jnp.asarray(rng.integers(0, 2, (1, dl.tbs)).astype(np.int8))

    @jax.jit
    def make_rx(key):
        tx, _ = pusch_tx(cfg, tb)
        noise = 0.05 * (jax.random.normal(key, tx.shape)
                        + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                                 tx.shape))
        return tx + 0.1 * tx[:, ::-1, :] + noise.astype(jnp.complex64)

    def stack(n, base):
        return jax.block_until_ready(jnp.stack(
            [make_rx(jax.random.PRNGKey(base + i)) for i in range(n)]))

    def scan_fn(body):
        @jax.jit
        def f(xs):
            c, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return c
        return f

    def rx_body(c, r):
        ok = pusch_rx(cfg, r[None] if r.ndim == 2 else r, n_iters=8)["tb_ok"]
        return c + jnp.sum(ok.astype(jnp.int32)), ()

    def txrx_body(c, r):
        tbd = jnp.bitwise_xor(tb_dl, (c.astype(jnp.int8) & 1))
        g, _ = pusch_tx_grid(dl, tbd)
        txs = ofdm_modulate(dl.fp, map_to_grid(dl.fp, g), 0)
        s = jnp.sum(jnp.abs(txs)).astype(jnp.int32) * 0
        ok = pusch_rx(cfg, r, n_iters=8)["tb_ok"]
        return c + jnp.sum(ok.astype(jnp.int32)) + s, ()

    def timed(f, xs):
        out = f(xs)
        _ = int(np.asarray(out))
        t0 = time.perf_counter()
        out = f(xs)
        n = int(np.asarray(out))
        return time.perf_counter() - t0, n

    lines = []

    def measure(name, body, budget_us):
        f = scan_fn(body)
        xs_l = stack(128, 0)
        xs_s = stack(32, 5000)
        t_l, n_l = timed(f, xs_l)
        t_s, _ = timed(f, xs_s)
        sustained_us = (t_l - t_s) / 96 * 1e6
        # jitter windows: K pairs of (12, 4)-slot scans on distinct slots
        K = 40
        samples = []
        for k in range(K):
            w12 = stack(12, 10_000 + 100 * k)
            t12, _ = timed(f, w12)
            t4, _ = timed(f, w12[:4])
            samples.append((t12 - t4) / 8 * 1e6)
        s = np.array(samples)
        p50, p90, p99 = np.percentile(s, [50, 90, 99])
        ok = p99 <= budget_us
        lines.append(
            f"{name}: sustained {sustained_us:.1f} us/slot | 8-slot-window "
            f"per-slot p50 {p50:.1f} p90 {p90:.1f} p99 {p99:.1f} us "
            f"(K={K}) | budget {budget_us:.0f} us x depth 2 -> "
            f"{'WITHIN' if ok else 'OVER'} budget "
            f"(decoded {n_l}/128 on the long window)")
        print(lines[-1], flush=True)
        return sustained_us, p99

    measure("UL PUSCH RX slot (273 PRB MCS16 2x2, B=1)", rx_body, 1000.0)
    measure("combined DL-TX + UL-RX slot (B=1)", txrx_body, 1000.0)

    if "--write" in sys.argv:
        hdr = [
            "# L1 per-slot latency artifact (round 5) — DEVICE timings",
            "#",
            "# Every timed region is one device program over distinct",
            "# device-resident slots (slope method, docs/PERF.md); the",
            "# ~30 ms axon tunnel roundtrip cancels and does NOT appear",
            "# in these numbers, unlike the r4 host-loop artifact.",
            "# Percentiles are across 8-slot windows: per-slot tails",
            "# inside a window are unobservable without per-slot host",
            "# fetches (which would measure the tunnel again); an 8-slot",
            "# window is the natural scale of the depth-2 executor",
            "# pipeline (runtime/executor.py), whose budget is",
            "# 500 us/slot x depth 2 at mu=1.",
            f"# Generated {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}",
            "#",
        ]
        with open("/root/repo/LATENCY_r05.txt", "w") as f:
            f.write("\n".join(hdr + lines) + "\n")
        print("written LATENCY_r05.txt")


if __name__ == "__main__":
    main()
