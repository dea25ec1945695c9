#!/usr/bin/env python3
"""Per-stage timing of the DL TX path (PDSCH slot compose + OFDM) at the
bench config (273 PRB, MCS16, 2 layers).

Same slope methodology as profile_stages.py: each stage is one jitted
lax.scan over distinct inputs; per-step time has the tunnel's fixed
dispatch+fetch cost subtracted.
"""
from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openairinterface5g_tpu.models.pusch import PuschConfig, pusch_tx_grid
    from openairinterface5g_tpu.models.pdsch import PdschConfig
    from openairinterface5g_tpu.coding import ldpc, rate_matching, segmentation
    from openairinterface5g_tpu.coding.crc import crc_attach
    from openairinterface5g_tpu.phy import modulation as mod
    from openairinterface5g_tpu.phy.ofdm import map_to_grid, ofdm_modulate
    from openairinterface5g_tpu.phy.scrambling import pusch_cinit, scramble

    dl = PdschConfig(mu=1, n_prb=273, mcs=16, n_layers=2)
    B, R = args.batch, args.reps
    p, crc_name = dl.seg_params()
    qm = dl.qm_rate[0]
    fp = dl.fp
    print(f"cfg: TBS={dl.tbs} C={p.C} K={p.K} Z={p.Z} BG={p.bg} G={dl.G}")

    rng = np.random.default_rng(0)
    tbs = jnp.asarray(rng.integers(0, 2, size=(R, B, dl.tbs)).astype(np.int8))

    g = ldpc.build_graph(p.bg, p.Z)
    es = tuple(dl.cb_e_sizes())
    cinit = pusch_cinit(dl.rnti, 0, dl.n_id)

    def to_cbs(tb):
        tb_crc = crc_attach(tb.astype(jnp.int8), crc_name)
        return segmentation.segment_tb(tb_crc, p)

    def to_cw(tb):
        cbs = to_cbs(tb)
        return ldpc.encode(g, cbs.reshape(B * p.C, p.K)).reshape(B, p.C, -1)

    def to_rm(tb):
        return rate_matching.fused_rate_match_tx(g, to_cw(tb), 0, es, qm, p.F)

    def to_syms(tb):
        scr = scramble(to_rm(tb), cinit)
        return mod.layer_map(mod.modulate(scr, qm), dl.n_layers)

    def to_grid(tb):
        return pusch_tx_grid(dl, tb)[0]

    def full_tx(tb):
        gr, _ = pusch_tx_grid(dl, tb)
        return ofdm_modulate(fp, map_to_grid(fp, gr[:, 0]), 0)

    # precomputed intermediate stacks for the back stages
    j_cw = jax.jit(to_cw)
    cws = jax.block_until_ready(jnp.stack([j_cw(tbs[i]) for i in range(R)]))
    j_grid = jax.jit(to_grid)
    grids = jax.block_until_ready(jnp.stack([j_grid(tbs[i]) for i in range(R)]))

    timed(to_cbs, tbs, "1 crc_attach + segment")
    timed(to_cw, tbs, "2  + ldpc encode")
    timed(to_rm, tbs, "3  + fused_rate_match_tx")
    timed(to_syms, tbs, "4  + scramble+modulate+layer_map")
    timed(to_grid, tbs, "5 pusch_tx_grid (full compose)")
    timed(lambda gr: ofdm_modulate(fp, map_to_grid(fp, gr[:, 0]), 0),
          grids, "6 map_to_grid + ofdm_modulate (given grid)")
    timed(full_tx, tbs, "7 FULL dl tx (grid + ofdm)")


if __name__ == "__main__":
    main()
