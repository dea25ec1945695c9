"""Web scope, VCD dumper, IQ player device tests (aux subsystems §5)."""
import urllib.request

import numpy as np


def test_webscope_serves_data(tmp_path):
    from openairinterface5g_tpu.utils.webscope import WebScope
    s = WebScope(port=0)
    try:
        s.publish("const", np.array([1 + 1j, -1 - 1j]))
        s.publish("llr_hist", np.arange(16.0))
        page = urllib.request.urlopen(f"http://127.0.0.1:{s.port}/").read()
        data = urllib.request.urlopen(
            f"http://127.0.0.1:{s.port}/data.json").read().decode()
        assert b"scope" in page
        assert "const" in data and "llr_hist" in data
        assert '"kind": "scatter"' in data and '"kind": "line"' in data
    finally:
        s.close()


def test_vcd_dump(tmp_path):
    from openairinterface5g_tpu.utils.vcd import VcdDumper
    v = VcdDumper(str(tmp_path / "trace.vcd"))
    with v.function("rx_func"):
        v.variable("slot", 3)
        with v.function("ldpc_decode"):
            pass
    path = v.write()
    text = open(path).read()
    assert "$var wire 1" in text and "rx_func" in text
    assert "$var integer 64" in text and "b11 " in text
    # function toggles: rx_func up before ldpc_decode, both close
    assert text.index("rx_func") < text.index("ldpc_decode")


def test_iqplayer_roundtrip(tmp_path):
    from openairinterface5g_tpu.radio.iqplayer import IQPlayerDevice
    x = (np.random.default_rng(0).normal(size=(2, 500))
         + 1j * np.random.default_rng(1).normal(size=(2, 500))).astype(np.complex64)
    p = str(tmp_path / "cap.iq")
    rec = IQPlayerDevice(p, n_ant=2, mode="record")
    rec.write(0, x[:, :250])
    rec.write(250, x[:, 250:])
    rec.close()
    rep = IQPlayerDevice(p, n_ant=2, mode="replay")
    assert np.allclose(rep.read(0, 500), x)
    # circular wrap
    y = rep.read(400, 200)
    assert np.allclose(y[:, :100], x[:, 400:])
    assert np.allclose(y[:, 100:], x[:, :100])
