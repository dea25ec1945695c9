"""nr_pbchsim equivalent: PBCH/SSB BLER simulator.

Mirrors openair1/SIMULATION/NR_PHY/pbchsim.c; CI points: pass at
SNR -11..-8 dB (test_case_list.xml:112-148).

Usage: python -m openairinterface5g_tpu.sim.pbchsim -s -8 -n 100
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="PBCH BLER simulator (nr_pbchsim analog)")
    ap.add_argument("-s", "--snr0", type=float, default=-8.0)
    ap.add_argument("-S", "--snr1", type=float, default=None)
    ap.add_argument("--snr-step", type=float, default=1.0)
    ap.add_argument("-n", "--n-trials", type=int, default=100)
    ap.add_argument("-y", "--n-rx", type=int, default=1)
    ap.add_argument("-I", "--cell-id", type=int, default=0)
    ap.add_argument("-L", "--list-size", type=int, default=8)
    ap.add_argument("-t", "--target-bler", type=float, default=0.1,
                    help="pass criterion: BLER below this at every SNR")
    ap.add_argument("--fading", action="store_true",
                    help="per-trial flat Rayleigh fading (default: AWGN+phase)")
    args = ap.parse_args(argv)

    from ..utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ..models.pbch import PbchConfig, ssb_generate, ssb_receive

    cfg = PbchConfig(n_id=args.cell_id, i_ssb=0)
    batch = min(args.n_trials, 16)
    print(f"PBCH sim: cell {args.cell_id} E=864 N=512 SCL{args.list_size} n_rx={args.n_rx}")

    @jax.jit
    def step(key, snr_db):
        kb, kh1, kh2, kn1, kn2 = jax.random.split(key, 5)
        payload = jax.random.bernoulli(kb, 0.5, (batch, 32)).astype(jnp.int8)
        tile = ssb_generate(cfg, payload)
        if args.fading:
            # per-trial flat Rayleigh per rx antenna
            h = (jax.random.normal(kh1, (batch, args.n_rx, 1, 1))
                 + 1j * jax.random.normal(kh2, (batch, args.n_rx, 1, 1))) / np.sqrt(2)
        else:
            # AWGN with random phase (the reference pbchsim default channel)
            phi = jax.random.uniform(kh1, (batch, args.n_rx, 1, 1), minval=0.0,
                                     maxval=2 * np.pi)
            h = jnp.exp(1j * phi)
        sigma = 10 ** (-snr_db / 20)
        noise = (jax.random.normal(kn1, (batch, args.n_rx, 4, 240))
                 + 1j * jax.random.normal(kn2, (batch, args.n_rx, 4, 240))) / np.sqrt(2)
        rx = h * tile[:, None] + sigma * noise
        bits, ok = ssb_receive(cfg, rx.astype(jnp.complex64), list_size=args.list_size)
        err = jnp.logical_or(~ok, jnp.any(bits != payload, axis=-1))
        return err

    snr1 = args.snr1 if args.snr1 is not None else args.snr0
    ok_all = True
    for snr in np.arange(args.snr0, snr1 + 1e-9, args.snr_step):
        rng = np.random.default_rng(11)
        n_err = n_done = 0
        t0 = time.time()
        while n_done < args.n_trials:
            key = jax.random.PRNGKey(rng.integers(1 << 30))
            errs = np.asarray(step(key, jnp.float32(snr)))
            take = min(batch, args.n_trials - n_done)
            n_err += int(errs[:take].sum())
            n_done += take
        bler = n_err / n_done
        print(f"SNR {snr:.2f} dB: PBCH BLER {bler:.6f} ({n_err}/{n_done}) in {time.time()-t0:.1f}s")
        if bler > args.target_bler:
            ok_all = False
    print("PBCH test OK" if ok_all else "PBCH test NOK")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
