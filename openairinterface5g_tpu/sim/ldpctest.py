"""ldpctest equivalent: LDPC codec BLER + throughput microbenchmark.

Mirrors openair1/PHY/CODING/TESTBENCH/ldpctest.c: derive (BG, Zc) from
block length, encode batches of segments, BPSK+AWGN, decode, report BLER
and per-stage throughput.  CI pass criterion: "BLER 0.000000" printed at
the operating point (test_case_list.xml:68-94: BG1 3872..8448 @ 10 dB).

Usage: python -m openairinterface5g_tpu.sim.ldpctest -l 8448 -s 10 -n 100
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def derive_params(block_length: int, bg: int | None = None):
    """BG/Kb/Z from block length (ldpctest.c:177-246 logic, per 38.212)."""
    from ..coding.segmentation import segment_params

    if bg is None:
        bg = 1 if block_length > 3840 else 2
    return segment_params(block_length, bg)


def main(argv=None):
    ap = argparse.ArgumentParser(description="LDPC codec test (ldpctest analog)")
    ap.add_argument("-l", "--block-length", type=int, default=8448)
    ap.add_argument("-s", "--snr", type=float, default=10.0)
    ap.add_argument("-S", "--snr1", type=float, default=None)
    ap.add_argument("--snr-step", type=float, default=0.5)
    ap.add_argument("-n", "--n-trials", type=int, default=100)
    ap.add_argument("-b", "--batch", type=int, default=None)
    ap.add_argument("-i", "--n-iters", type=int, default=20)
    ap.add_argument("-r", "--rate", type=float, default=1 / 3,
                    help="code rate via rate matching (1/3 = mother code BG1)")
    ap.add_argument("-g", "--bg", type=int, default=None, choices=[1, 2])
    args = ap.parse_args(argv)

    from ..utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ..coding import ldpc, rate_matching

    p = derive_params(args.block_length, args.bg)
    g = ldpc.build_graph(p.bg, p.Z)
    E = min(int(round(args.block_length / args.rate)), g.N)
    print(f"LDPC test: block {args.block_length} BG{p.bg} Z={p.Z} K={p.K} "
          f"F={p.F} E={E} rate {args.block_length/E:.3f} iters {args.n_iters}")

    batch = args.batch or min(args.n_trials, 32)

    @jax.jit
    def step(key, snr_db):
        kb, kn = jax.random.split(key)
        info = jax.random.bernoulli(kb, 0.5, (batch, p.K)).astype(jnp.int8)
        # zero the filler region (known bits)
        if p.F:
            info = info.at[:, p.K - p.F:].set(0)
        cw = ldpc.encode(g, info)
        e = rate_matching.rate_match_tx(g, cw, 0, E, p.F)
        tx = 1.0 - 2.0 * e.astype(jnp.float32)
        sigma = 10 ** (-snr_db / 20)
        y = tx + sigma * jax.random.normal(kn, tx.shape)
        llr = 2.0 * y / sigma**2
        full = rate_matching.rate_match_rx(g, llr, 0, p.F)
        bits, ok, iters = ldpc.decode(g, full, n_iters=args.n_iters)
        errs = jnp.any(bits != info, axis=-1)
        return errs, iters

    snr1 = args.snr1 if args.snr1 is not None else args.snr
    all_zero = True
    for snr in np.arange(args.snr, snr1 + 1e-9, args.snr_step):
        rng = np.random.default_rng(17)
        n_err = 0
        n_done = 0
        t0 = time.time()
        while n_done < args.n_trials:
            key = jax.random.PRNGKey(rng.integers(1 << 30))
            errs, _ = step(key, jnp.float32(snr))
            take = min(batch, args.n_trials - n_done)
            n_err += int(np.asarray(errs)[:take].sum())
            n_done += take
        dt = time.time() - t0
        bler = n_err / n_done
        mbps = args.block_length * n_done / dt / 1e6
        print(f"SNR {snr:.2f} dB: BLER {bler:.6f} ({n_err}/{n_done}), "
              f"decode+encode throughput {mbps:.2f} Mb/s")
        if bler > 0:
            all_zero = False
    return 0 if all_zero else 1


if __name__ == "__main__":
    sys.exit(main())
