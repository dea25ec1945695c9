"""nr_prachsim equivalent: PRACH detection-rate simulator.

CI points (test_case_list.xml:491-513): detection at -30 dB (per-sample
SNR; the 839-point correlation provides ~29 dB processing gain).

Usage: python -m openairinterface5g_tpu.sim.prachsim -s -30 -n 256
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="PRACH simulator (nr_prachsim analog)")
    ap.add_argument("-s", "--snr0", type=float, default=-30.0)
    ap.add_argument("-S", "--snr1", type=float, default=None)
    ap.add_argument("--snr-step", type=float, default=2.0)
    ap.add_argument("-n", "--n-trials", type=int, default=256)
    ap.add_argument("-y", "--n-rx", type=int, default=1)
    ap.add_argument("--fading", action="store_true", help="flat Rayleigh per trial (default: AWGN+phase)")
    ap.add_argument("-L", "--l-ra", type=int, default=839, choices=[139, 839])
    ap.add_argument("-t", "--target", type=float, default=0.01,
                    help="pass: miss-detection rate below this")
    args = ap.parse_args(argv)

    from ..utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ..models.prach import PrachConfig, prach_rx, prach_tx

    cfg = PrachConfig(l_ra=args.l_ra, roots=(129, 140), n_cs=13)
    n_pre = min(64, len(cfg.roots) * cfg.shifts_per_root)
    batch = min(args.n_trials, 64)
    print(f"PRACH sim: L_RA={args.l_ra} {len(cfg.roots)} roots N_cs={cfg.n_cs} "
          f"n_rx={args.n_rx} ({n_pre} preambles)")

    @jax.jit
    def step(key, snr_db):
        kp, kh1, kh2, kn1, kn2 = jax.random.split(key, 5)
        pre = jax.random.randint(kp, (batch,), 0, n_pre)
        tx = prach_tx(cfg, pre)
        if args.fading:
            h = (jax.random.normal(kh1, (batch, args.n_rx, 1))
                 + 1j * jax.random.normal(kh2, (batch, args.n_rx, 1))) / np.sqrt(2)
        else:
            phi = jax.random.uniform(kh1, (batch, args.n_rx, 1), maxval=2 * np.pi)
            h = jnp.exp(1j * phi)
        # per-sample SNR: preamble occupies l_ra bins of an ~l_ra-pt symbol
        sigma = 10 ** (-snr_db / 20)
        sh = (batch, args.n_rx, cfg.l_ra)
        noise = (jax.random.normal(kn1, sh) + 1j * jax.random.normal(kn2, sh)) / np.sqrt(2)
        rx = (h * tx[:, None] + sigma * noise).astype(jnp.complex64)
        out = prach_rx(cfg, rx)
        miss = jnp.logical_or(~out["detected"], out["preamble"] != pre)
        return miss

    snr1 = args.snr1 if args.snr1 is not None else args.snr0
    ok_all = True
    for snr in np.arange(args.snr0, snr1 + 1e-9, args.snr_step):
        rng = np.random.default_rng(31)
        n_err = n_done = 0
        t0 = time.time()
        while n_done < args.n_trials:
            errs = np.asarray(step(jax.random.PRNGKey(rng.integers(1 << 30)),
                                   jnp.float32(snr)))
            take = min(batch, args.n_trials - n_done)
            n_err += int(errs[:take].sum())
            n_done += take
        rate = n_err / n_done
        print(f"SNR {snr:.2f} dB: miss rate {rate:.6f} ({n_err}/{n_done}) "
              f"in {time.time()-t0:.1f}s")
        if rate > args.target:
            ok_all = False
    print("PRACH test OK" if ok_all else "PRACH test NOK")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
