#!/usr/bin/env python3
"""Headline benchmark: NR PUSCH gNB RX slots/s/chip at 100 MHz 2x2.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the real-time requirement of 2000 slots/s at
30 kHz SCS (BASELINE.md north star; the reference publishes no absolute
slots/s — real-time on commodity x86 is its operating point).
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

    cfg = PuschConfig(mu=1, n_prb=273, mcs=16, n_layers=2, n_rx=2,
                      decoder_backend="pallas")
    B = 4  # slots per dispatch

    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, size=(B, cfg.tbs)).astype(np.int8))

    # complex IQ never crosses the host boundary (axon backend limitation):
    # the TX waveform + channel + noise are built inside one jitted fn and
    # the device-resident rx array feeds the separately-timed RX step.
    @jax.jit
    def make_rx(t, key):
        tx, _ = pusch_tx(cfg, t)
        noise = 0.05 * (jax.random.normal(key, tx.shape)
                        + 1j * jax.random.normal(jax.random.fold_in(key, 1), tx.shape))
        return tx + 0.1 * tx[:, ::-1, :] + noise.astype(jnp.complex64)

    # STRICT methodology: the tunnel elides repeated identical executions,
    # so every timed repetition gets a distinct input; block on all results.
    n_rep = 24
    rxs = [jax.block_until_ready(make_rx(tb, jax.random.PRNGKey(i)))
           for i in range(n_rep)]

    step = jax.jit(lambda r: pusch_rx(cfg, r, n_iters=8)["tb_ok"])
    ok = jax.block_until_ready(step(rxs[0]))  # compile
    assert bool(np.asarray(ok).all()), "bench config must decode cleanly"

    # drain via host fetch: on the axon backend block_until_ready returns
    # before execution completes, so fetching each (tiny bool) result is
    # the only sound completion barrier
    t0 = time.perf_counter()
    outs = [step(rxs[i]) for i in range(n_rep)]
    fetched = [np.asarray(o) for o in outs]
    dt = time.perf_counter() - t0
    assert all(f.all() for f in fetched)
    slots_per_s = B * n_rep / dt

    print(json.dumps({
        "metric": "pusch_rx_slots_per_s_100mhz_2x2",
        "value": round(slots_per_s, 2),
        "unit": "slots/s/chip",
        "vs_baseline": round(slots_per_s / 2000.0, 4),
    }))


if __name__ == "__main__":
    main()
