"""Autotest runner: the reference CI operating points as one command.

Mirrors cmake_targets/autotests/run_exec_autotests.bash +
test_case_list.xml: each case runs a simulator CLI in-process and greps
its stdout for the pass string.  Case list follows BASELINE.md.

Usage:
  python -m openairinterface5g_tpu.sim.autotest            # quick set
  python -m openairinterface5g_tpu.sim.autotest --full     # all points
"""
from __future__ import annotations

import argparse
import contextlib
import io
import sys
import time


CASES = [
    # (id, module, argv, pass_string, quick)
    ("ldpctest-BG1-8448", "ldpctest", ["-l", "8448", "-s", "10", "-n", "64"], "BLER 0.000000", True),
    ("ldpctest-BG1-3872", "ldpctest", ["-l", "3872", "-s", "10", "-n", "64"], "BLER 0.000000", False),
    ("ldpctest-BG2-1024", "ldpctest", ["-l", "1024", "-s", "10", "-n", "64"], "BLER 0.000000", False),
    ("polartest-PBCH", "polartest", ["-q", "-s", "-6", "-n", "64"], "BLER 0.000000", True),
    ("polartest-DCI", "polartest", ["-c", "-k", "40", "-E", "216", "-s", "0", "-n", "64"], "BLER 0.000000", False),
    ("polartest-UCI", "polartest", ["-u", "-k", "16", "-E", "240", "-s", "0", "-n", "64"], "BLER 0.000000", False),
    # NOTE: our SNR is per occupied SSB RE; the reference pbchsim SNR is
    # diluted over the whole carrier (240/1272 SCs at 106 PRB ~ +7 dB),
    # so -7 dB here corresponds to about -14 dB in the reference's units.
    ("pbchsim-m7dB", "pbchsim", ["-s", "-7", "-n", "64"], "PBCH test OK", True),
    ("ulsim-mcs9-106", "ulsim", ["-m", "9", "-R", "106", "-s", "6", "-n", "64", "-t", "99"], "PUSCH test OK", True),
    ("ulsim-mcs9-sc-fdma", "ulsim", ["-m", "9", "-R", "75", "-s", "7", "-n", "64", "-t", "99"], "PUSCH test OK", False),
    ("ulsim-mimo2x2", "ulsim", ["-m", "9", "-R", "106", "-W", "2", "-y", "2", "-s", "11", "-n", "64", "-t", "99"], "PUSCH test OK", False),
    ("dlsim-mcs9-106", "dlsim", ["-m", "9", "-R", "106", "-s", "6", "-n", "64", "-t", "99"], "PDSCH test OK", True),
    ("dlsim-mcs27-256qam", "dlsim", ["-m", "26", "-q", "2", "-R", "106", "-s", "27", "-n", "32", "-t", "99"], "PDSCH test OK", False),
    ("pucchsim-f0-1bit", "pucchsim", ["-f", "0", "-b", "1", "-s", "-2", "-n", "256"], "PUCCH test OK", True),
    ("pucchsim-f2-6bit", "pucchsim", ["-f", "2", "-b", "6", "-s", "2", "-n", "256"], "PUCCH test OK", False),
    ("prachsim-m28dB", "prachsim", ["-s", "-28", "-n", "256"], "PRACH test OK", True),
    ("ulschsim-mcs9", "ulschsim", ["-m", "9", "-R", "106", "-s", "6", "-n", "32"], "ULSCH test OK", False),
    ("dlschsim-mcs15", "dlschsim", ["-m", "15", "-R", "106", "-s", "10", "-n", "32"], "DLSCH test OK", False),
    # LTE legacy stack (dlsim/ulsim analogs of the eNB physims)
    ("lte-dlsim-mcs10", "lte_dlsim", ["-m", "10", "-R", "25", "-s", "12", "-n", "16", "-t", "99"], "LTE PDSCH test OK", False),
    ("lte-ulsim-mcs16-2rx", "lte_ulsim", ["-m", "16", "-R", "25", "-s", "14", "-n", "16", "-t", "99", "-y", "2"], "LTE PUSCH test OK", False),
    # 3GPP G-FR1-A5-13 (40 MHz, 30 kHz SCS, 2 RX, TDL-A 10ns, 2 HARQ
    # rounds, 7 iters): 70% TP at 12.4 dB (test_case_list.xml:457)
    ("ulsim-conformance-GFR1A513", "ulsim",
     ["-m", "20", "-R", "106", "-y", "2", "-g", "TDLA", "--delay-spread", "10",
      "-M", "2", "-I", "7", "-s", "12.4", "-n", "128", "-b", "64", "-t", "70",
      "-D", "1", "--chest-window", "16"], "PUSCH test OK", False),
]


def _gpp(mu, prb, n_rx, snr, iters=7, mcs=20, layers=1, chan="TDLA", ds="10"):
    """One nr_ulsim.3gpp conformance point (test_case_list.xml:427-489):
    MCS20 (or the MIMO variants), TDL channel, 2 HARQ rounds, >=70% eff
    throughput at the listed SNR."""
    argv = ["-m", str(mcs), "-R", str(prb), "-u", str(mu), "-y", str(n_rx),
            "-g", chan, "--delay-spread", ds, "-M", "2", "-I", str(iters),
            "-s", str(snr), "-n", "128", "-b", "64", "-t", "70", "-D", "1",
            "--chest-window", "16"]
    if layers > 1:
        argv += ["-W", str(layers)]
    return argv


# The reference CI's full nr_ulsim.3gpp matrix (28 points) + nr_ulsim.mimo.
# Same numerology/PRB/RX/SNR operating points; pass gate identical
# ("PUSCH test OK" at eff TP >= 70%).
CONFORMANCE_CASES = [
    ("3gpp-01-A5-13-40MHz-2rx", _gpp(1, 106, 2, 12.4)),
    ("3gpp-02-A5-13-40MHz-4rx", _gpp(1, 106, 4, 8.5)),
    ("3gpp-03-A5-13-40MHz-8rx", _gpp(1, 106, 8, 5.4)),
    ("3gpp-04-A5-8-5MHz-2rx", _gpp(0, 25, 2, 12.5)),
    ("3gpp-05-A5-8-5MHz-4rx", _gpp(0, 25, 4, 8.9)),
    ("3gpp-06-A5-8-5MHz-8rx", _gpp(0, 25, 8, 5.7)),
    ("3gpp-07-A5-9-10MHz-2rx", _gpp(0, 52, 2, 12.6)),
    ("3gpp-08-A5-9-10MHz-4rx", _gpp(0, 52, 4, 8.9)),
    ("3gpp-09-A5-9-10MHz-8rx", _gpp(0, 52, 8, 5.8)),
    ("3gpp-10-A5-10-20MHz-2rx", _gpp(0, 106, 2, 12.3)),
    ("3gpp-11-A5-10-20MHz-4rx", _gpp(0, 106, 4, 8.8)),
    ("3gpp-12-A5-10-20MHz-8rx", _gpp(0, 106, 8, 5.7)),
    ("3gpp-13-A5-11-10MHz-2rx", _gpp(1, 24, 2, 12.5)),
    ("3gpp-14-A5-11-10MHz-4rx", _gpp(1, 24, 4, 8.6)),
    ("3gpp-15-A5-11-10MHz-8rx", _gpp(1, 24, 8, 5.6)),
    ("3gpp-16-A5-12-20MHz-2rx", _gpp(1, 51, 2, 12.5)),
    ("3gpp-17-A5-12-20MHz-4rx", _gpp(1, 51, 4, 8.6)),
    ("3gpp-18-A5-12-20MHz-8rx", _gpp(1, 51, 8, 5.6)),
    ("3gpp-19-A5-13-40MHz-2rx", _gpp(1, 106, 2, 12.5)),
    ("3gpp-20-A5-13-40MHz-4rx", _gpp(1, 106, 4, 8.7)),
    ("3gpp-21-A5-13-40MHz-8rx", _gpp(1, 106, 8, 5.5)),
    ("3gpp-22-A5-14-100MHz-2rx", _gpp(1, 273, 2, 13.1)),
    ("3gpp-23-A5-14-100MHz-4rx", _gpp(1, 273, 4, 9.2)),
    ("3gpp-24-A5-14-100MHz-8rx", _gpp(1, 273, 8, 5.9, iters=8)),
    ("3gpp-25-A3-27-2layer-2rx", _gpp(1, 106, 2, 1.7, iters=15, mcs=2,
                                      layers=2, chan="TDLB", ds="30")),
    ("3gpp-26-A3-27-2layer-4rx", _gpp(1, 106, 4, -2.1, iters=15, mcs=2,
                                      layers=2, chan="TDLB", ds="30")),
    ("3gpp-27-A4-27-2layer-2rx", _gpp(1, 106, 2, 18.7, iters=15, mcs=16,
                                      layers=2, chan="TDLC", ds="30")),
    ("3gpp-28-A4-27-2layer-4rx", _gpp(1, 106, 4, 11.2, iters=15, mcs=16,
                                      layers=2, chan="TDLC", ds="30")),
    # nr_ulsim.mimo matrix (test_case_list.xml:409-425), AWGN
    ("mimo-1-mcs19-50prb-2rx", ["-m", "19", "-R", "50", "-y", "2", "-s", "15",
                                "-n", "64", "-t", "99"]),
    ("mimo-2-mcs9-2layer", ["-m", "9", "-R", "106", "-W", "2", "-y", "2",
                            "-s", "8", "-n", "64", "-t", "85"]),
    ("mimo-3-mcs10-2layer", ["-m", "10", "-R", "106", "-W", "2", "-y", "2",
                             "-s", "12", "-n", "64", "-t", "99"]),
    ("mimo-4-mcs19-2layer", ["-m", "19", "-R", "106", "-W", "2", "-y", "2",
                             "-s", "22", "-n", "64", "-t", "99"]),
    ("mimo-5-mcs9-4layer", ["-m", "9", "-R", "106", "-W", "4", "-y", "4",
                            "-s", "10", "-n", "64", "-t", "85"]),
]


def run_case(module: str, argv: list[str]) -> str:
    import importlib

    mod = importlib.import_module(f"openairinterface5g_tpu.sim.{module}")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        try:
            mod.main(argv)
        except SystemExit:
            pass
    return buf.getvalue()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--conformance", action="store_true",
                    help="run the 28-point nr_ulsim.3gpp matrix + mimo set")
    ap.add_argument("--filter", type=str, default="")
    args = ap.parse_args(argv)

    from ..utils.cache import enable_compile_cache
    enable_compile_cache()

    case_list = list(CASES)
    if args.conformance:
        case_list = [(cid, "ulsim", cargv, "PUSCH test OK", True)
                     for cid, cargv in CONFORMANCE_CASES]

    results = []
    for cid, module, case_argv, pass_str, quick in case_list:
        if not args.full and not args.conformance and not quick:
            continue
        if args.filter and args.filter not in cid:
            continue
        t0 = time.time()
        out = run_case(module, case_argv)
        ok = pass_str in out
        results.append((cid, ok, time.time() - t0))
        print(f"[{'PASS' if ok else 'FAIL'}] {cid} ({time.time()-t0:.1f}s)")
        if not ok:
            print("  --- output tail ---")
            print("  " + "\n  ".join(out.strip().splitlines()[-5:]))
    n_ok = sum(1 for _, ok, _ in results if ok)
    print(f"\n{n_ok}/{len(results)} autotests passed")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
