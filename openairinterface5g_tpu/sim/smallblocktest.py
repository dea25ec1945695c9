"""smallblocktest equivalent: (32, K) Reed-Muller UCI codec BLER test.

Mirrors openair1/PHY/CODING/TESTBENCH/smallblocktest.c: for each payload
size K in 1..11, encode random payloads, BPSK + AWGN sweep, ML-decode
(small_block.decode correlates against all 2^K codewords on the MXU) and
report BLER per SNR point.

Usage: python -m openairinterface5g_tpu.sim.smallblocktest -s -2 -S 2 -n 1000
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="small block (RM 32,K) test")
    ap.add_argument("-k", "--payload-bits", type=int, default=0,
                    help="single K to test (default: sweep 3..11)")
    ap.add_argument("-s", "--snr0", type=float, default=-2.0)
    ap.add_argument("-S", "--snr1", type=float, default=None)
    ap.add_argument("--snr-step", type=float, default=1.0)
    ap.add_argument("-n", "--n-trials", type=int, default=1000)
    args = ap.parse_args(argv)

    from ..utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ..coding import small_block

    ks = [args.payload_bits] if args.payload_bits else list(range(3, 12))
    snr1 = args.snr1 if args.snr1 is not None else args.snr0
    batch = min(args.n_trials, 256)
    worst = 0.0

    for K in ks:
        @jax.jit
        def step(key, snr_db, K=K):
            kb, kn = jax.random.split(key)
            payload = jax.random.bernoulli(kb, 0.5, (batch, K)).astype(jnp.int8)
            enc = small_block.encode(payload)          # (batch, 32)
            tx = 1.0 - 2.0 * enc.astype(jnp.float32)
            sigma = 10 ** (-snr_db / 20)
            y = tx + sigma * jax.random.normal(kn, tx.shape)
            bits = small_block.decode(2 * y / sigma**2, K)
            return jnp.any(bits != payload, axis=-1)

        for snr in np.arange(args.snr0, snr1 + 1e-9, args.snr_step):
            rng = np.random.default_rng(5)
            n_err = n_done = 0
            t0 = time.time()
            while n_done < args.n_trials:
                key = jax.random.PRNGKey(rng.integers(1 << 30))
                errs = np.asarray(step(key, jnp.float32(snr)))
                take = min(batch, args.n_trials - n_done)
                n_err += int(errs[:take].sum())
                n_done += take
            bler = n_err / n_done
            worst = max(worst, bler)
            print(f"K {K:2d}  SNR {snr:6.2f} dB: BLER {bler:.6f} "
                  f"({n_err}/{n_done}) in {time.time()-t0:.1f}s")
    # smallblocktest.c prints per-point block error counts; autotest-style
    # pass string for the driver
    print("Small block test OK" if worst == 0.0 else
          f"Small block worst BLER {worst:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
