#!/usr/bin/env python3
"""Combined DL-TX + UL-RX slot benchmark (the real real-time criterion:
the reference gNB transmits AND receives every slot).

One scan step = one full gNB slot: compose+OFDM a 273-PRB 2-layer PDSCH
DL slot AND run the complete PUSCH RX (fused frontend + rate recovery +
pallas LDPC decode) on a 2x2 UL slot.  Slope methodology as bench.py.

Writes BENCH_TXRX_r05.json next to the repo root when --json is given.
"""
from __future__ import annotations

import json
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
    from openairinterface5g_tpu.phy.ofdm import map_to_grid, ofdm_modulate
    from openairinterface5g_tpu.models.pdsch import PdschConfig

    cfg = PuschConfig(mu=1, n_prb=273, mcs=16, n_layers=2, n_rx=2,
                      decoder_backend="pallas", decoder_check_every=1)
    dl = PdschConfig(mu=1, n_prb=273, mcs=16, n_layers=2)
    B = 8
    n1, n2 = 8, 32

    rng = np.random.default_rng(0)
    tb_ul = jnp.asarray(rng.integers(0, 2, (B, cfg.tbs)).astype(np.int8))
    tb_dl = jnp.asarray(rng.integers(0, 2, (B, dl.tbs)).astype(np.int8))

    @jax.jit
    def make_rx(key):
        tx, _ = pusch_tx(cfg, tb_ul)
        noise = 0.05 * (jax.random.normal(key, tx.shape)
                        + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                                 tx.shape))
        return tx + 0.1 * tx[:, ::-1, :] + noise.astype(jnp.complex64)

    def stack(n, base):
        return jax.block_until_ready(jnp.stack(
            [make_rx(jax.random.PRNGKey(base + i)) for i in range(n)]))

    @jax.jit
    def slot_all(rxs):
        def body(c, r):
            # DL TX: full slot composition + OFDM (payload keyed off the
            # carry so every step transmits distinct data)
            tbd = jnp.bitwise_xor(tb_dl, (c.astype(jnp.int8) & 1))
            g, _ = pusch_tx_grid(dl, tbd)
            txs = ofdm_modulate(dl.fp, map_to_grid(dl.fp, g), 0)
            dl_sum = jnp.sum(jnp.abs(txs))
            # UL RX: complete PUSCH receive
            ok = pusch_rx(cfg, r, n_iters=8)["tb_ok"]
            return c + jnp.sum(ok.astype(jnp.int32)) + (dl_sum * 0
                                                        ).astype(jnp.int32), ()
        c, _ = jax.lax.scan(body, jnp.int32(0), rxs)
        return c

    def run(xs):
        out = slot_all(xs)
        _ = int(np.asarray(out))
        t0 = time.perf_counter()
        out = slot_all(xs)
        n_ok = int(np.asarray(out))
        return time.perf_counter() - t0, n_ok

    xs1 = stack(n1, 0)
    xs2 = stack(n2, 100)
    t1, _ = run(xs1)
    t2, n_ok = run(xs2)
    per_step = (t2 - t1) / (n2 - n1)
    slots_s = B / per_step
    assert n_ok >= B * n2, n_ok
    res = {
        "metric": "gnb_txrx_slots_per_s_100mhz_2x2",
        "value": round(slots_s, 2),
        "unit": "slots/s/chip",
        "vs_baseline": round(slots_s / 2000.0, 4),
        "note": "DL TX (273 PRB 2-layer PDSCH slot compose+OFDM, both "
                "ports) + full UL PUSCH RX per slot; slope-timed",
    }
    print(json.dumps(res))
    if "--json" in sys.argv:
        with open("/root/repo/BENCH_TXRX_r05.json", "w") as f:
            json.dump(res, f)


if __name__ == "__main__":
    main()
