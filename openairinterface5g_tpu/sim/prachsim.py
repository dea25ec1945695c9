"""nr_prachsim equivalent: PRACH detection simulator over the full CI
matrix (test_case_list.xml:491-513): 8 configs at -30 dB incl. 120 kHz
short formats and the high-speed restricted set.

SNR definition matches prachsim.c:721: noise per time-domain sample at
the carrier sample rate, sigma2_dB = tx_lev_dB - SNR - 10log10(12*N_RB/
N_ZC) — the preamble's correlation gain over the full band is what makes
-30 dB detectable.

Usage (reference argv shapes):
  python -m openairinterface5g_tpu.sim.prachsim -a -s -30 -n 100 -p 63 -R 106
  python -m openairinterface5g_tpu.sim.prachsim -a -s -30 -n 100 -R 66 -m 3 -c 52 -H
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

# prach_ConfigurationIndex -> preamble format for the rows the reference
# CI uses (38.211 Tables 6.3.3.2-3 FR1 / 6.3.3.2-4 FR2; get_nr_prach_info
# _from_index analog, reduced to the long-format ranges + the CI rows)
def _format_from_config(config_index: int, mu: int) -> str:
    if mu == 3:                        # FR2 table
        fr2 = {52: "A2"}
        if config_index in fr2:
            return fr2[config_index]
        return "A2"
    if config_index < 28:
        return "0"
    if config_index < 34:
        return "1"
    if config_index < 40:
        return "2"
    if config_index < 67:
        return "3"
    fr1_short = {98: "A2"}
    return fr1_short.get(config_index, "A2")


def main(argv=None):
    ap = argparse.ArgumentParser(description="PRACH simulator (nr_prachsim analog)")
    ap.add_argument("-a", "--awgn", action="store_true",
                    help="AWGN (no fading) — reference -a flag")
    ap.add_argument("-s", "--snr0", type=float, default=-30.0)
    ap.add_argument("-S", "--snr1", type=float, default=None)
    ap.add_argument("--snr-step", type=float, default=2.0)
    ap.add_argument("-n", "--n-trials", type=int, default=100)
    ap.add_argument("-y", "--n-rx", type=int, default=1)
    ap.add_argument("-R", "--n-rb", type=int, default=106,
                    help="UL bandwidth in PRBs (sets the sample rate)")
    ap.add_argument("-m", "--mu", type=int, default=1,
                    help="numerology (3 selects the FR2 config table)")
    ap.add_argument("-c", "--config-index", type=int, default=98,
                    help="prach_ConfigurationIndex (selects the format)")
    ap.add_argument("-Z", "--ncs-config", type=int, default=13,
                    help="zeroCorrelationZoneConfig (0-15)")
    ap.add_argument("-H", "--high-speed", action="store_true",
                    help="restricted set type A (long formats)")
    ap.add_argument("-p", "--preamble", type=int, default=None,
                    help="fixed preamble index to transmit (default: random)")
    ap.add_argument("-r", "--root-seq-index", type=int, default=1)
    ap.add_argument("--format", type=str, default=None,
                    help="override the preamble format (0-3, A1..B4)")
    ap.add_argument("--fading", action="store_true",
                    help="flat Rayleigh per trial")
    ap.add_argument("-t", "--target", type=float, default=0.01,
                    help="pass: miss-detection rate below this")
    args = ap.parse_args(argv)

    from ..utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ..config import fft_size_for_rb
    from ..models.prach import (PrachTdConfig, get_ncs, nr_roots,
                                prach_td_rx, prach_td_tx)

    fmt = args.format or _format_from_config(args.config_index, args.mu)
    restricted = (1 if args.high_speed and fmt in "0123" else 0)
    n_cs = get_ncs(args.ncs_config, fmt, restricted)
    l_ra = 839 if fmt in "0123" else 139
    fs = fft_size_for_rb(args.n_rb) * 15e3 * (1 << args.mu)

    # enough logical roots for 64 preambles
    from ..models.prach import cyclic_shifts
    roots, logical = [], args.root_seq_index
    while True:
        u = nr_roots(logical, 1, l_ra)[0]
        roots.append(u)
        total = sum(len(cyclic_shifts(u2, l_ra, n_cs, restricted))
                    for u2 in roots)
        if total >= 64 or logical - args.root_seq_index > 400:
            break
        logical += 1
    cfg = PrachTdConfig(fmt=fmt, mu=args.mu, sample_rate=fs,
                        roots=tuple(roots), n_cs=n_cs, threshold=8.0)
    fcfg = dataclass_replace_restricted(cfg, restricted)
    n_pre = min(64, fcfg.freq_cfg().n_preambles)
    assert n_pre > 0, "no preambles available for this config"
    batch = min(args.n_trials, 32)
    print(f"PRACH sim: fmt {fmt} L_RA={l_ra} N_cs={n_cs} "
          f"restricted={restricted} {len(roots)} roots ({n_pre} preambles) "
          f"fs={fs/1e6:.2f} MHz n_rx={args.n_rx}")

    @jax.jit
    def step(key, snr_db):
        kp, kh1, kh2, kn = jax.random.split(key, 4)
        if args.preamble is not None:
            pre = jnp.full((batch,), min(args.preamble, n_pre - 1), jnp.int32)
        else:
            pre = jax.random.randint(kp, (batch,), 0, n_pre)
        tx = prach_td_tx(fcfg, pre)                 # (B, n_samples)
        if args.fading:
            h = (jax.random.normal(kh1, (batch, args.n_rx, 1))
                 + 1j * jax.random.normal(kh2, (batch, args.n_rx, 1))) / np.sqrt(2)
        else:
            phi = jax.random.uniform(kh1, (batch, args.n_rx, 1),
                                     maxval=2 * np.pi)
            h = jnp.exp(1j * phi)
        # prachsim.c:721 noise scale: per full-rate sample, less the
        # occupied-bandwidth dilution 12*N_RB/N_ZC
        tx_lev = jnp.mean(jnp.abs(tx) ** 2)
        sigma2 = tx_lev * 10 ** (-snr_db / 10) / (12 * args.n_rb / l_ra)
        sh = (batch, args.n_rx, tx.shape[-1])
        noise = (jax.random.normal(kn, sh)
                 + 1j * jax.random.normal(jax.random.fold_in(kn, 1), sh))
        rx = (h * tx[:, None] + jnp.sqrt(sigma2 / 2) * noise
              ).astype(jnp.complex64)
        out = prach_td_rx(fcfg, rx)
        miss = jnp.logical_or(~out["detected"], out["preamble"] != pre)
        return miss

    # reference semantics (prachsim.c:710,805): sweep snr0 upward and
    # pass at the FIRST SNR with miss rate below target
    snr1 = args.snr1 if args.snr1 is not None else args.snr0
    passed = False
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
        if rate <= args.target:
            passed = True
            break
    print("PRACH test OK" if passed else "PRACH test NOK")
    return 0 if passed else 1


def dataclass_replace_restricted(cfg, restricted: int):
    """PrachTdConfig carrying the restricted-set flag through freq_cfg."""
    import dataclasses as _dc
    if restricted == 0:
        return cfg
    return _dc.replace(cfg, restricted=restricted)


if __name__ == "__main__":
    sys.exit(main())
