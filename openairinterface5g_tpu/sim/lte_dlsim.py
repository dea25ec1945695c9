"""LTE PDSCH BLER/throughput simulator (the reference's `dlsim`,
openair1/SIMULATION/LTE_PHY/dlsim.c).

Usage: python -m openairinterface5g_tpu.sim.lte_dlsim -m 28 -R 100 -s 30 -n 64
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

HARQ_RV_SEQ = (0, 1, 2, 3)      # LTE rv order (36.321 canonical cycling)


def build_step(cfg, max_rounds: int, n_iters: int, channel_name: str,
               delay_spread_ns: float = 30.0, uplink: bool = False):
    import jax
    import jax.numpy as jnp

    from .channel import ChannelModel, add_noise, apply_channel
    if uplink:
        from ..lte.pusch import pusch_rx as rx_fn, pusch_tx as tx_fn
    else:
        from ..lte.pdsch import pdsch_rx as rx_fn, pdsch_tx as tx_fn

    model = ChannelModel(channel_name, 1, cfg.n_rx, cfg.fp.sample_rate,
                         delay_spread_ns=delay_spread_ns)

    @jax.jit
    def step(key, tb, snr_db):
        oks = []
        acc = None                   # HARQ chase/IR soft-combining state
        for r in range(max_rounds):
            rv = HARQ_RV_SEQ[r % 4]
            key, k1, k2 = jax.random.split(key, 3)
            tx, _ = tx_fn(cfg, tb, rv=rv)
            sig = jnp.mean(jnp.sum(jnp.abs(tx) ** 2, axis=-2))
            sigma2 = sig * (cfg.fp.fft_size / cfg.fp.n_sc) * 10 ** (-snr_db / 10)
            rx, _ = apply_channel(model, k1, tx)
            rx = add_noise(k2, rx, sigma2)
            out = rx_fn(cfg, rx, rv=rv, n_iters=n_iters, acc_streams=acc)
            acc = out["streams"]
            oks.append(out["tb_ok"])
        return jnp.stack(oks)

    return step


def run_sweep(cfg, snrs, n_trials, batch, max_rounds=1, n_iters=6,
              channel="AWGN", eff_tp_check=70.0, seed=42, verbose=True,
              delay_spread_ns=30.0, uplink=False, duty: float = 1.0):
    import jax
    import jax.numpy as jnp

    step = build_step(cfg, max_rounds, n_iters, channel, delay_spread_ns,
                      uplink=uplink)
    rng = np.random.default_rng(seed)
    results, all_pass = [], True
    for snr_db in snrs:
        n_done = ok_any = rounds_used = 0
        t0 = time.time()
        while n_done < n_trials:
            B = min(batch, n_trials - n_done)
            tb = jnp.asarray(rng.integers(0, 2, (batch, cfg.tbs)).astype(np.int8))
            key = jax.random.PRNGKey(rng.integers(1 << 30))
            oks = np.asarray(step(key, tb, jnp.float32(snr_db)))[:, :B]
            any_ok = oks.any(axis=0)
            ok_any += int(any_ok.sum())
            rounds_used += int(np.where(any_ok, oks.argmax(axis=0) + 1,
                                        max_rounds).sum())
            n_done += B
        dt = time.time() - t0
        bler = 1.0 - ok_any / n_done
        avg_rounds = rounds_used / n_done
        eff_tp = 100.0 * (ok_any / n_done) / avg_rounds
        # per 1 ms subframe, scaled by the TDD duty factor (1.0 = FDD)
        mbps = cfg.tbs * (ok_any / n_done) / avg_rounds / 1e3 * duty
        results.append({"snr_db": float(snr_db), "bler": bler,
                        "avg_rounds": avg_rounds, "eff_throughput_pct": eff_tp,
                        "mbps": mbps, "trials": n_done, "wall_s": dt})
        if verbose:
            print(f"SNR {snr_db:6.2f} dB | BLER {bler:.6f} | avg rounds "
                  f"{avg_rounds:.2f} | {mbps:.2f} Mb/s | eff TP {eff_tp:.2f}% "
                  f"| {n_done} trials in {dt:.1f}s")
        if eff_tp < eff_tp_check:
            all_pass = False
    return results, all_pass


def main(argv=None):
    ap = argparse.ArgumentParser(description="LTE PDSCH simulator (dlsim analog)")
    ap.add_argument("-m", "--mcs", type=int, default=28)
    ap.add_argument("-R", "--n-rb", type=int, default=50)
    ap.add_argument("-s", "--snr0", type=float, default=30.0)
    ap.add_argument("-S", "--snr1", type=float, default=None)
    ap.add_argument("--snr-step", type=float, default=1.0)
    ap.add_argument("-n", "--n-trials", type=int, default=64)
    ap.add_argument("-b", "--batch", type=int, default=None)
    ap.add_argument("-y", "--n-rx", type=int, default=1)
    ap.add_argument("-g", "--channel", default="AWGN",
                    choices=["AWGN", "EPA", "EVA", "ETU", "TDLA", "TDLB", "TDLC"])
    ap.add_argument("-M", "--max-rounds", type=int, default=1)
    ap.add_argument("-I", "--n-iters", type=int, default=6)
    ap.add_argument("-t", "--eff-tp-check", type=float, default=70.0)
    ap.add_argument("-d", "--tdd-config", type=int, default=None,
                    choices=range(7),
                    help="LTE TDD uplink-downlink configuration (36.211 "
                         "Table 4.2-2); throughput reflects the DL duty "
                         "(D subframes + DwPTS at 11/14 symbols)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    from ..lte.pdsch import LtePdschConfig

    cfg = LtePdschConfig(n_rb=args.n_rb, n_prb=args.n_rb, mcs=args.mcs,
                         n_rx=args.n_rx)
    duty = 1.0
    if args.tdd_config is not None:
        from ..runtime.tdd import lte_tdd_counts
        n_d, n_s, _ = lte_tdd_counts(args.tdd_config)
        duty = (n_d + n_s * 11.0 / 14.0) / 10.0
    print(f"LTE PDSCH sim: {args.n_rb} PRB MCS {args.mcs} (Qm={cfg.qm}) "
          f"TBS {cfg.tbs} C={cfg.seg().C} channel={args.channel}"
          + (f" TDD cfg {args.tdd_config} (DL duty {duty:.2f})"
             if args.tdd_config is not None else " FDD"))
    snr1 = args.snr1 if args.snr1 is not None else args.snr0
    snrs = np.arange(args.snr0, snr1 + 1e-9, args.snr_step)
    batch = args.batch or max(1, min(32, args.n_trials))
    results, ok = run_sweep(cfg, snrs, args.n_trials, batch,
                            max_rounds=args.max_rounds, n_iters=args.n_iters,
                            channel=args.channel,
                            eff_tp_check=args.eff_tp_check, duty=duty)
    if args.json:
        print(json.dumps(results))
    print("LTE PDSCH test OK" if ok else "LTE PDSCH test NOK")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
