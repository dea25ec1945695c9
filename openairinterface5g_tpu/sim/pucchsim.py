"""nr_pucchsim equivalent: PUCCH format 0/2 ACK-miss / BLER simulator.

CI points (test_case_list.xml:279-323): F0 1-2 bit @ -2 dB;
F2 3-11 bit @ 0-6 dB; F2 12-64 bit @ -3 dB.

Usage: python -m openairinterface5g_tpu.sim.pucchsim -f 0 -b 1 -s -2 -n 1000
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="PUCCH simulator (nr_pucchsim analog)")
    ap.add_argument("-f", "--format", type=int, default=0, choices=[0, 1, 2, 3, 4])
    ap.add_argument("-b", "--n-bits", type=int, default=1)
    ap.add_argument("-P", "--n-prb", type=int, default=4)
    ap.add_argument("-s", "--snr0", type=float, default=-2.0)
    ap.add_argument("-S", "--snr1", type=float, default=None)
    ap.add_argument("--snr-step", type=float, default=1.0)
    ap.add_argument("-n", "--n-trials", type=int, default=256)
    ap.add_argument("-y", "--n-rx", type=int, default=1)
    ap.add_argument("--fading", action="store_true", help="flat Rayleigh per trial (default: AWGN+phase)")
    ap.add_argument("-t", "--target", type=float, default=0.01,
                    help="pass criterion: error rate below this")
    args = ap.parse_args(argv)

    from ..utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ..models.pucch import (
        Pucch0Config, Pucch1Config, Pucch2Config, Pucch34Config,
        pucch0_rx, pucch0_tx, pucch1_rx, pucch1_tx, pucch2_rx, pucch2_tx,
        pucch34_rx, pucch34_tx,
    )

    batch = min(args.n_trials, 64)

    def _channel(kh1, kh2, kn1, kn2, tx, snr_db):
        if args.fading:
            h = (jax.random.normal(kh1, (batch, args.n_rx, 1, 1))
                 + 1j * jax.random.normal(kh2, (batch, args.n_rx, 1, 1))) / np.sqrt(2)
        else:
            phi = jax.random.uniform(kh1, (batch, args.n_rx, 1, 1),
                                     maxval=2 * np.pi)
            h = jnp.exp(1j * phi)
        sigma = 10 ** (-snr_db / 20)
        sh = (batch, args.n_rx) + tx.shape[1:]
        noise = (jax.random.normal(kn1, sh)
                 + 1j * jax.random.normal(kn2, sh)) / np.sqrt(2)
        return (h * tx[:, None] + sigma * noise).astype(jnp.complex64)

    if args.format == 1:
        cfg = Pucch1Config(n_bits=args.n_bits, n_symbols=14)
        print(f"PUCCH F1 sim: {args.n_bits} bits 14 syms, n_rx={args.n_rx}")

        @jax.jit
        def step(key, snr_db):
            ku, kh1, kh2, kn1, kn2 = jax.random.split(key, 5)
            uci = jax.random.randint(ku, (batch,), 0, 1 << args.n_bits)
            rx = _channel(kh1, kh2, kn1, kn2, pucch1_tx(cfg, uci), snr_db)
            got, _ = pucch1_rx(cfg, rx)
            return got != uci
    elif args.format in (3, 4):
        cfg = Pucch34Config(fmt=args.format, n_bits=args.n_bits,
                            n_prb=args.n_prb if args.format == 3 else 1,
                            n_symbols=14)
        print(f"PUCCH F{args.format} sim: {args.n_bits} bits "
              f"{cfg.n_prb} PRB 14 syms, n_rx={args.n_rx}")

        @jax.jit
        def step(key, snr_db):
            ku, kh1, kh2, kn1, kn2 = jax.random.split(key, 5)
            uci = jax.random.bernoulli(ku, 0.5, (batch, args.n_bits)
                                       ).astype(jnp.int8)
            rx = _channel(kh1, kh2, kn1, kn2, pucch34_tx(cfg, uci), snr_db)
            got, ok = pucch34_rx(cfg, rx)
            return jnp.logical_or(~ok, jnp.any(got != uci, axis=-1))
    elif args.format == 0:
        cfg = Pucch0Config(n_bits=args.n_bits, n_symbols=1)
        print(f"PUCCH F0 sim: {args.n_bits} bits, n_rx={args.n_rx}")

        @jax.jit
        def step(key, snr_db):
            ku, kh1, kh2, kn1, kn2 = jax.random.split(key, 5)
            uci = jax.random.randint(ku, (batch,), 0, 1 << args.n_bits)
            tx = pucch0_tx(cfg, uci)
            if args.fading:
                h = (jax.random.normal(kh1, (batch, args.n_rx, 1, 1))
                     + 1j * jax.random.normal(kh2, (batch, args.n_rx, 1, 1))) / np.sqrt(2)
            else:
                phi = jax.random.uniform(kh1, (batch, args.n_rx, 1, 1), maxval=2 * np.pi)
                h = jnp.exp(1j * phi)
            sigma = 10 ** (-snr_db / 20)
            sh = (batch, args.n_rx, cfg.n_symbols, 12)
            noise = (jax.random.normal(kn1, sh) + 1j * jax.random.normal(kn2, sh)) / np.sqrt(2)
            rx = (h * tx[:, None] + sigma * noise).astype(jnp.complex64)
            got, _ = pucch0_rx(cfg, rx)
            return got != uci
    else:
        cfg = Pucch2Config(n_bits=args.n_bits, n_prb=args.n_prb)
        print(f"PUCCH F2 sim: {args.n_bits} bits {args.n_prb} PRB, n_rx={args.n_rx}")

        @jax.jit
        def step(key, snr_db):
            ku, kh1, kh2, kn1, kn2 = jax.random.split(key, 5)
            uci = jax.random.bernoulli(ku, 0.5, (batch, args.n_bits)).astype(jnp.int8)
            tx = pucch2_tx(cfg, uci)
            if args.fading:
                h = (jax.random.normal(kh1, (batch, args.n_rx, 1, 1))
                     + 1j * jax.random.normal(kh2, (batch, args.n_rx, 1, 1))) / np.sqrt(2)
            else:
                phi = jax.random.uniform(kh1, (batch, args.n_rx, 1, 1), maxval=2 * np.pi)
                h = jnp.exp(1j * phi)
            sigma = 10 ** (-snr_db / 20)
            sh = (batch, args.n_rx) + tx.shape[1:]
            noise = (jax.random.normal(kn1, sh) + 1j * jax.random.normal(kn2, sh)) / np.sqrt(2)
            rx = (h * tx[:, None] + sigma * noise).astype(jnp.complex64)
            got, ok = pucch2_rx(cfg, rx)
            return jnp.logical_or(~ok, jnp.any(got != uci, axis=-1))

    # reference semantics (pucchsim.c:537,736): sweep snr0..snr1 upward in
    # 1 dB steps, pass at the FIRST point meeting the target error rate
    snr1 = args.snr1 if args.snr1 is not None else args.snr0
    passed = False
    for snr in np.arange(args.snr0, snr1 + 1e-9, args.snr_step):
        rng = np.random.default_rng(23)
        n_err = n_done = 0
        t0 = time.time()
        while n_done < args.n_trials:
            errs = np.asarray(step(jax.random.PRNGKey(rng.integers(1 << 30)),
                                   jnp.float32(snr)))
            take = min(batch, args.n_trials - n_done)
            n_err += int(errs[:take].sum())
            n_done += take
        rate = n_err / n_done
        print(f"SNR {snr:.2f} dB: UCI error rate {rate:.6f} ({n_err}/{n_done}) "
              f"in {time.time()-t0:.1f}s")
        if rate <= args.target:
            passed = True
            break
    print("PUCCH test OK" if passed else "PUCCH test NOK")
    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
