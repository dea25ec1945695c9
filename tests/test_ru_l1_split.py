"""RU <-> L1 IF4p5-analog fronthaul split: BLER parity through the
int16 freq-domain quantization, RU and L1 as concurrent endpoints.

The C7 functional split as an actual transport boundary: per-(symbol,
antenna) UDP packets of block-floating-point int16 IQ, UL and DL."""
import threading

import numpy as np

from openairinterface5g_tpu.fronthaul import if4p5
from openairinterface5g_tpu.runtime import ru_l1_split


def test_if4p5_codec_roundtrip():
    rng = np.random.default_rng(0)
    iq = (rng.normal(size=600) + 1j * rng.normal(size=600)
          ).astype(np.complex64) * 3.7
    p = if4p5.If4p5Packet(if4p5.UL_FD, 12, 3, 5, 1, 42, iq)
    q = if4p5.unpack(if4p5.pack(p))
    assert (q.frame, q.slot, q.symbol, q.antenna) == (12, 3, 5, 1)
    # int16 BFP: relative error bounded by the quantization step
    err = np.abs(q.iq - iq).max() / np.abs(iq).max()
    assert err < 1e-3, err


def test_ru_l1_split_bler():
    res = {}

    def ru():
        ru_l1_split.run_ru(n_trials=32, log=lambda *a: None)

    t = threading.Thread(target=ru)
    t.start()
    res["l1"] = ru_l1_split.run_l1(n_trials=32, log=lambda *a: None)
    t.join(timeout=600)
    assert res["l1"] is True, "BLER parity through the IF4p5 split failed"
