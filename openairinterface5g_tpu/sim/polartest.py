"""polartest equivalent: polar codec BLER test (PBCH/DCI/UCI paths).

Mirrors openair1/PHY/CODING/TESTBENCH/polartest.c; CI operating points
(test_case_list.xml:96-110): PBCH/DCI BLER=0 @ -10 dB (sic: with QPSK
and aggregation these are low-rate points), UCI @ -2 dB.

Usage: python -m openairinterface5g_tpu.sim.polartest -q            # PBCH
       python -m openairinterface5g_tpu.sim.polartest -c -k 40 -E 108  # DCI
       python -m openairinterface5g_tpu.sim.polartest -u -k 16 -E 240  # UCI
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="polar codec test (polartest analog)")
    ap.add_argument("-q", "--pbch", action="store_true")
    ap.add_argument("-c", "--dci", action="store_true")
    ap.add_argument("-u", "--uci", action="store_true")
    ap.add_argument("-k", "--payload-bits", type=int, default=32)
    ap.add_argument("-E", "--encoded-bits", type=int, default=864)
    ap.add_argument("-s", "--snr0", type=float, default=-2.0)
    ap.add_argument("-S", "--snr1", type=float, default=None)
    ap.add_argument("--snr-step", type=float, default=0.5)
    ap.add_argument("-n", "--n-trials", type=int, default=100)
    ap.add_argument("-L", "--list-size", type=int, default=8)
    args = ap.parse_args(argv)

    from ..utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ..coding import polar
    from ..coding.crc import crc_attach

    if args.pbch:
        A, E, crc_name, n_max, i_il, n_pc, i_bil = 32, 864, "24C", 9, True, 0, False
    elif args.uci:
        A, E = args.payload_bits, args.encoded_bits
        if A >= 20:
            crc_name, n_pc = "11", 0
        else:
            crc_name, n_pc = "6", 3
        n_max, i_il, i_bil = 10, False, True
    else:  # DCI
        A, E, crc_name, n_max, i_il, n_pc, i_bil = args.payload_bits, args.encoded_bits, "24C", 9, True, 0, False

    from ..coding.crc import CRC_POLYS
    K = A + CRC_POLYS[crc_name][0]
    p = polar.polar_params(K=K, E=E, n_max=n_max, i_il=i_il, n_pc=n_pc,
                           n_pc_wm=0, i_bil=i_bil)
    mode = "PBCH" if args.pbch else ("UCI" if args.uci else "DCI")
    print(f"polar test ({mode}): A={A} K={K} E={E} N={p.N} mode={p.mode} "
          f"L={args.list_size}")

    batch = min(args.n_trials, 16)

    @jax.jit
    def step(key, snr_db):
        kb, kn = jax.random.split(key)
        payload = jax.random.bernoulli(kb, 0.5, (batch, A)).astype(jnp.int8)
        enc = polar.encode(p, crc_attach(payload, crc_name))
        tx = 1.0 - 2.0 * enc.astype(jnp.float32)
        sigma = 10 ** (-snr_db / 20)
        y = tx + sigma * jax.random.normal(kn, tx.shape)
        bits, ok = polar.decode_with_crc(p, 2 * y / sigma**2, crc_name,
                                         list_size=args.list_size)
        err = jnp.logical_or(~ok, jnp.any(bits != payload, axis=-1))
        return err

    snr1 = args.snr1 if args.snr1 is not None else args.snr0
    all_zero = True
    for snr in np.arange(args.snr0, snr1 + 1e-9, args.snr_step):
        rng = np.random.default_rng(3)
        n_err = n_done = 0
        t0 = time.time()
        while n_done < args.n_trials:
            key = jax.random.PRNGKey(rng.integers(1 << 30))
            errs = np.asarray(step(key, jnp.float32(snr)))
            take = min(batch, args.n_trials - n_done)
            n_err += int(errs[:take].sum())
            n_done += take
        print(f"SNR {snr:.2f} dB: BLER {n_err/n_done:.6f} ({n_err}/{n_done}) "
              f"in {time.time()-t0:.1f}s")
        if n_err:
            all_zero = False
    return 0 if all_zero else 1


if __name__ == "__main__":
    sys.exit(main())
