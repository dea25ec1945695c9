#!/usr/bin/env python3
"""Headline benchmark: NR PUSCH gNB RX slots/s/chip at 100 MHz 2x2.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the real-time requirement of 2000 slots/s at
30 kHz SCS (BASELINE.md north star; the reference publishes no absolute
slots/s — real-time on commodity x86 is its operating point).

Methodology (docs/PERF.md): the axon tunnel elides repeated identical
executions AND adds ~40 ms of host roundtrip per dispatch/fetch, so the
timed region is ONE jitted lax.scan over n_rep DISTINCT device-resident
slot batches whose per-step results fold into a single scalar (a data
dependency that forces every step to execute), fetched once.  This
measures device throughput — what a production deployment with local
dispatch sees — not tunnel latency.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the 273-PRB graphs take minutes to compile
    # cold over the remote-compile tunnel, seconds warm
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from openairinterface5g_tpu.models.pusch import PuschConfig, pusch_rx, pusch_tx

    # decoder_check_every=1: IN-KERNEL parity early termination
    # (nrLDPC_decoder.c:554 analog) — a pl.when-predicated fori body checks
    # the full syndrome every iteration and skips the remaining work once
    # every CB in the sublane group passes; the syndrome sweep costs less
    # than the decode iteration it saves (5128 vs 4838 slots/s at
    # check_every 2, vs 4654 for the two-phase host fallback)
    cfg = PuschConfig(mu=1, n_prb=273, mcs=16, n_layers=2, n_rx=2,
                      decoder_backend="pallas", decoder_check_every=1)
    B = 8   # slots per step (deeper batch amortizes per-op dispatch cost;
            # still within the reference's sl_ahead≈6-slot pipeline depth)
    n_rep = 128  # timed steps: amortizes the tunnel's fixed ~30 ms
                 # dispatch+fetch so the figure reflects device throughput
                 # (slope-validated; production has no tunnel)

    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, size=(B, cfg.tbs)).astype(np.int8))

    # complex IQ never crosses the host boundary (axon backend limitation):
    # the TX waveform + channel + noise are built inside one jitted fn and
    # the device-resident rx arrays feed the separately-timed RX scan.
    @jax.jit
    def make_rx(t, key):
        tx, _ = pusch_tx(cfg, t)
        noise = 0.05 * (jax.random.normal(key, tx.shape)
                        + 1j * jax.random.normal(jax.random.fold_in(key, 1), tx.shape))
        return tx + 0.1 * tx[:, ::-1, :] + noise.astype(jnp.complex64)

    def stack_rx(i0):
        return jnp.stack([make_rx(tb, jax.random.PRNGKey(i0 + i))
                          for i in range(n_rep)])

    @jax.jit
    def rx_all(rxs):
        def body(c, r):
            ok = pusch_rx(cfg, r, n_iters=8)["tb_ok"]
            return c + jnp.sum(ok.astype(jnp.int32)), ()
        c, _ = jax.lax.scan(body, jnp.int32(0), rxs)
        return c

    # warm set: compile + correctness check (every TB must decode)
    warm = jax.block_until_ready(stack_rx(0))
    n_ok = int(np.asarray(rx_all(warm)))
    assert n_ok == B * n_rep, f"bench config must decode cleanly ({n_ok})"

    # timed set: DISTINCT inputs so the tunnel cannot elide re-execution;
    # single host fetch of the folded scalar is the completion barrier
    timed = jax.block_until_ready(stack_rx(n_rep))
    t0 = time.perf_counter()
    n_ok = int(np.asarray(rx_all(timed)))
    dt = time.perf_counter() - t0
    assert n_ok == B * n_rep
    slots_per_s = B * n_rep / dt

    print(json.dumps({
        "metric": "pusch_rx_slots_per_s_100mhz_2x2",
        "value": round(slots_per_s, 2),
        "unit": "slots/s/chip",
        "vs_baseline": round(slots_per_s / 2000.0, 4),
    }))


if __name__ == "__main__":
    main()
