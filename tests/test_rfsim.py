import threading

import numpy as np
import jax.numpy as jnp

from openairinterface5g_tpu.radio.rfsim import RfSimDevice, record_iq, replay_iq


def test_rfsim_loopback():
    port = 47801
    got = {}

    def server():
        d = RfSimDevice.listen(port, n_ant=2)
        got["rx"] = d.read(100, 500)
        d.write(100, got["rx"] * (0.5 + 0j))
        d.close()

    t = threading.Thread(target=server)
    t.start()
    c = RfSimDevice.connect("127.0.0.1", port, n_ant=2)
    rng = np.random.default_rng(0)
    tx = (rng.standard_normal((2, 500)) + 1j * rng.standard_normal((2, 500))).astype(np.complex64)
    c.write(100, tx)
    echo = c.read(100, 500)
    t.join()
    np.testing.assert_allclose(got["rx"], tx)
    np.testing.assert_allclose(echo, tx * 0.5)
    c.close()


def test_rfsim_gap_zero_fill():
    port = 47802
    got = {}

    def server():
        d = RfSimDevice.listen(port, n_ant=1)
        got["rx"] = d.read(0, 300)   # covers [0, 300): peer sends [0,100)+[200,300)
        d.close()

    t = threading.Thread(target=server)
    t.start()
    c = RfSimDevice.connect("127.0.0.1", port, n_ant=1)
    a = np.ones(100, np.complex64)
    c.write(0, a)
    c.write(200, 2 * a)
    t.join()
    rx = got["rx"][0]
    np.testing.assert_allclose(rx[:100], 1.0)
    np.testing.assert_allclose(rx[100:200], 0.0)
    np.testing.assert_allclose(rx[200:], 2.0)
    c.close()


def test_rfsim_pusch_over_the_wire():
    """Full PUSCH slot through the native transport: UE thread TX -> gNB RX."""
    from openairinterface5g_tpu.models.pusch import PuschConfig, pusch_rx, pusch_tx

    cfg = PuschConfig(mu=1, n_prb=6, mcs=4, n_layers=1, n_rx=1)
    rng = np.random.default_rng(7)
    tb = rng.integers(0, 2, (1, cfg.tbs)).astype(np.int8)
    port = 47803
    n_samp = cfg.fp.samples_per_slot(0)

    def ue():
        tx, _ = pusch_tx(cfg, jnp.asarray(tb))
        d = RfSimDevice.connect("127.0.0.1", port, n_ant=1, timeout_ms=20000)
        d.write(0, np.asarray(tx)[0])
        d.close()

    t = threading.Thread(target=ue)
    t.start()  # before listen(): listen blocks in accept until a peer dials
    g = RfSimDevice.listen(port, n_ant=1)
    rx = g.read(0, n_samp)
    t.join()
    g.close()
    out = pusch_rx(cfg, jnp.asarray(rx[None]), n_iters=8)
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["tb_bits"][0]), tb[0])


def test_iq_record_replay(tmp_path):
    rng = np.random.default_rng(1)
    iq = (rng.standard_normal(777) + 1j * rng.standard_normal(777)).astype(np.complex64)
    p = str(tmp_path / "cap.iq")
    record_iq(p, iq)
    back = replay_iq(p, 777)
    np.testing.assert_allclose(back, iq)


def test_native_channel_model():
    """Channel model applied inside the native hub (rfsimu_setchanmod
    analog): a 2-tap FIR convolves the stream across frame boundaries."""
    import threading
    import numpy as np
    from openairinterface5g_tpu.radio.rfsim import RfSimDevice

    port = 17893
    res = {}
    chan_set = threading.Event()   # configure before the client transmits
                                   # (runtime re-config applies from the
                                   # next frame, as in the reference)

    def server():
        dev = RfSimDevice.listen(port, n_ant=1)
        taps = np.array([1.0 + 0j, 0.5j], np.complex64)
        dev.set_channel(taps, noise_sigma=0.0)
        chan_set.set()
        res["rx"] = dev.read(0, 8)[0]
        dev.close()

    t = threading.Thread(target=server)
    t.start()
    cli = RfSimDevice.connect("127.0.0.1", port, n_ant=1)
    assert chan_set.wait(timeout=10)
    x = np.arange(1, 5).astype(np.complex64)
    cli.write(0, x[:2])     # three frames: FIR state must carry across
    cli.write(2, x[2:])
    cli.write(4, np.zeros(4, np.complex64))
    t.join(timeout=10)
    cli.close()
    assert not t.is_alive()
    got = res["rx"]
    exp = np.convolve(np.concatenate([x, np.zeros(4, np.complex64)]),
                      np.array([1.0, 0.5j]), mode="full")[:8]
    np.testing.assert_allclose(got, exp.astype(np.complex64), atol=1e-5)
