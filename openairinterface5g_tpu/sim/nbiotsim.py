"""NB-IoT PHY simulator CLI: NPSS/NSSS sync, NPBCH repetition gain,
NPDSCH/NPUSCH roundtrips, NPRACH detection — one pass/fail gate.

Usage: python -m openairinterface5g_tpu.sim.nbiotsim [-n TRIALS]
Prints "NB-IoT test OK" when every stage meets its operating point.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--n-trials", type=int, default=8)
    ap.add_argument("-s", "--noise", type=float, default=0.6)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from ..lte import nbiot

    rng = np.random.default_rng(0)
    B = args.n_trials
    ok = True

    def noise(shape, s):
        return s * jnp.asarray((rng.normal(size=shape)
                                + 1j * rng.normal(size=shape)
                                ).astype(np.complex64))

    # sync
    g = nbiot.npss_insert(jnp.zeros((B, 14, 12), jnp.complex64))
    m = np.asarray(nbiot.npss_detect(g + noise((B, 14, 12), 0.4)))
    print(f"NPSS detect metric: {m.mean():.2f} (threshold 0.4)")
    ok &= (m > 0.4).all()
    n_id = 133
    g2 = nbiot.nsss_insert(jnp.zeros((B, 14, 12), jnp.complex64), n_id, 0)
    ids, _ = nbiot.nsss_identify(g2 + noise((B, 14, 12), 0.4),
                                 range(120, 150))
    n_sync = int((np.asarray(ids) == n_id).sum())
    print(f"NSSS id: {n_sync}/{B}")
    ok &= n_sync == B

    # NPBCH with 8-rep combining
    cfg = nbiot.NbConfig(n_id=n_id, n_reps=8)
    mib = jnp.asarray(rng.integers(0, 2, (B, nbiot.MIB_NB_BITS)
                                   ).astype(np.int8))
    tiles = nbiot.npbch_tx(cfg, mib)
    out = nbiot.npbch_rx(cfg, tiles + noise(tiles.shape, 1.2))
    n_mib = int(np.asarray(out["ok"]).sum())
    print(f"NPBCH (8 reps @ sigma 1.2): {n_mib}/{B}")
    ok &= n_mib == B

    # NPDSCH / NPUSCH
    for ul in (False, True):
        c = nbiot.NbSchConfig(tbs=256, n_sf=2, n_reps=4, ul=ul)
        tb = jnp.asarray(rng.integers(0, 2, (B, c.tbs)).astype(np.int8))
        t = nbiot.nbsch_tx(c, tb)
        o = nbiot.nbsch_rx(c, t + noise(t.shape, args.noise))
        n = int(np.asarray(o["ok"]).sum())
        print(f"{'NPUSCH' if ul else 'NPDSCH'} (4 reps @ sigma "
              f"{args.noise}): {n}/{B}")
        ok &= n == B

    # NPRACH
    pc = nbiot.NprachConfig()
    det = 0
    for n0 in range(0, 12, 3):
        t = nbiot.nprach_tx(pc, n0, batch=1)
        o = nbiot.nprach_detect(pc, t + noise(t.shape, 0.25))
        det += int(np.asarray(o["detected"])[0]
                   and int(np.asarray(o["n_init"])[0]) == n0)
    print(f"NPRACH: {det}/4 preambles detected")
    ok &= det == 4

    print("NB-IoT test OK" if ok else "NB-IoT test NOK")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
