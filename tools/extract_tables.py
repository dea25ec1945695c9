#!/usr/bin/env python3
"""One-time extraction of 3GPP TS 38.212 spec constant tables into npz.

The numeric data extracted here is pure 3GPP spec data:
  - LDPC base graphs BG1/BG2 (TS 38.212 Tables 5.3.2-2 / 5.3.2-3): for each
    of the 8 lifting-set indices iLS, a (rows x cols) matrix of shift values
    V(i,j), with -1 marking "no edge".  Read from the reference checkout's
    plain-text matrices (/root/reference/.../nrLDPC_decoder_LYC/bgs/BG{1,2}_I{0..7})
    which are a verbatim rendering of the spec tables.
  - Polar reliability sequence Q_0^{Nmax-1} for Nmax=1024 (TS 38.212
    Table 5.3.1.2-1), read from nr_polar_sequence_pattern.c.  Sequences for
    N < 1024 are derived per spec by filtering (elements < N), which we
    verify against the reference's explicit sub-tables.

Output: openairinterface5g_tpu/data/spec_tables.npz
"""
import os
import re
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "openairinterface5g_tpu", "data", "spec_tables.npz")

BG_SHAPES = {1: (46, 68), 2: (42, 52)}


def parse_bg(bg: int) -> np.ndarray:
    """Return (8, rows, cols) int16 shift matrices, -1 = no edge."""
    rows, cols = BG_SHAPES[bg]
    out = np.empty((8, rows, cols), dtype=np.int16)
    for ils in range(8):
        path = f"{REF}/openair1/PHY/CODING/nrLDPC_decoder_LYC/bgs/BG{bg}_I{ils}"
        txt = open(path).read()
        nums = [int(t) for t in re.findall(r"-?\d+", txt.split("{", 1)[1])]
        # strip the trailing "};" artifacts: exactly rows*cols numbers expected
        assert len(nums) >= rows * cols, (bg, ils, len(nums))
        mat = np.array(nums[: rows * cols], dtype=np.int16).reshape(rows, cols)
        out[ils] = mat
    # sanity: edge pattern identical across lifting sets
    mask0 = out[0] >= 0
    for ils in range(1, 8):
        assert np.array_equal(out[ils] >= 0, mask0), f"BG{bg} edge mask differs at iLS={ils}"
    n_edges = int(mask0.sum())
    expected = {1: 316, 2: 197}[bg]
    assert n_edges == expected, f"BG{bg}: {n_edges} edges != {expected}"
    return out


def parse_polar() -> np.ndarray:
    path = f"{REF}/openair1/PHY/CODING/nrPolar_tools/nr_polar_sequence_pattern.c"
    txt = open(path).read()
    seqs = {}
    for m in re.finditer(r"Q_0_Nminus1_(\d+)\[(\d+)\]\s*=\s*\{([^}]*)\}", txt):
        n = int(m.group(2))
        vals = np.array([int(t) for t in m.group(3).replace("\n", " ").split(",")], dtype=np.int32)
        assert len(vals) == n
        seqs[n] = vals
    q1024 = seqs[1024]
    assert sorted(q1024.tolist()) == list(range(1024))
    # verify spec filtering rule reproduces every sub-table
    for n, seq in seqs.items():
        if n == 1024:
            continue
        derived = q1024[q1024 < n]
        assert np.array_equal(derived, seq), f"polar filter rule failed for N={n}"
    return q1024.astype(np.int16)


def parse_phi() -> dict:
    """TS 38.211 Tables 5.2.2.2-1..4: low-PAPR base sequence phases phi(n)
    for M_ZC in {6,12,18,24}, 30 groups each."""
    path = f"{REF}/openair1/PHY/NR_REFSIG/ul_ref_seq_nr.h"
    txt = open(path).read()
    txt = re.sub(r"/\*.*?\*/", "", txt, flags=re.S)
    txt = re.sub(r"//[^\n]*", "", txt)
    out = {}
    for M in (6, 12, 18, 24):
        m = re.search(rf"phi_M_ZC_{M}\[[^\]]*\]\s*=\s*\{{(.*?)\}};", txt, re.S)
        vals = np.array([int(t) for t in re.findall(r"-?\d+", m.group(1))], dtype=np.int8)
        assert len(vals) == M * 30
        out[f"phi{M}"] = vals.reshape(30, M)
    return out


def main():
    bg1 = parse_bg(1)
    bg2 = parse_bg(2)
    polar = parse_polar()
    phi = parse_phi()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, bg1=bg1, bg2=bg2, polar_q1024=polar, **phi)
    print(f"wrote {OUT}: bg1{bg1.shape} bg2{bg2.shape} polar{polar.shape} + phi tables")


if __name__ == "__main__":
    sys.exit(main())
