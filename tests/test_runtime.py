import numpy as np
import jax
import jax.numpy as jnp

from openairinterface5g_tpu.models.srs import SrsConfig, srs_rx, srs_tx
from openairinterface5g_tpu.runtime.executor import SlotExecutor
from openairinterface5g_tpu.utils.profiling import MeasGroup


def test_srs_channel_estimate():
    cfg = SrsConfig(n_prb=24, comb=2, u=3)
    rng = np.random.default_rng(0)
    B = 4
    tx = srs_tx(cfg, B)  # (B, 1, 288)
    h_true = (rng.standard_normal((B, 2, 1, 1)) + 1j * rng.standard_normal((B, 2, 1, 1))) / np.sqrt(2)
    rx = h_true.astype(np.complex64) * np.asarray(tx)[:, None, 0][:, :, None, :]
    rx = rx[:, :, 0, :] + 0.05 * (rng.standard_normal((B, 2, 288)) + 1j * rng.standard_normal((B, 2, 288))).astype(np.complex64)
    out = srs_rx(cfg, jnp.asarray(rx))
    h = np.asarray(out["h"])  # (B, 2, 1, 144)
    est = h.mean(axis=-1)[:, :, 0]
    np.testing.assert_allclose(est, h_true[:, :, 0, 0], atol=0.05)
    assert float(np.asarray(out["noise_var"]).mean()) < 0.02


def test_slot_executor_pipeline():
    step = jax.jit(lambda i, x: jnp.sum(x * x) + i)
    ex = SlotExecutor(lambda i, x: step(i, x), depth=2)
    inputs = [(jnp.full((64, 64), float(i)),) for i in range(10)]
    results = ex.run(inputs)
    assert len(results) == 10
    assert len(ex.stats) == 10
    assert "over 10 slots" in ex.report()
    # results in order
    for i, r in enumerate(results):
        assert abs(float(r) - (64 * 64 * i * i + i)) < 1e-3


def test_meas_group_report():
    import time
    mg = MeasGroup()
    for _ in range(3):
        with mg.measure("stage_a"):
            time.sleep(0.001)
    rep = mg.report()
    assert "stage_a" in rep and mg["stage_a"].count == 3


def test_csirs_measurement_cqi():
    from openairinterface5g_tpu.models.csirs import CsirsConfig, csi_measure, csirs_tx_grid
    cfg = CsirsConfig(n_prb=48)
    rng = np.random.default_rng(0)
    B = 4
    tx = csirs_tx_grid(cfg, B, 12 * 48)
    h_true = 1.5 * np.exp(1j * 0.3)
    for snr_set in (5.0, 20.0):
        sigma = abs(h_true) * 10 ** (-snr_set / 20)
        noise = sigma * (rng.standard_normal((B, 2, 576)) + 1j * rng.standard_normal((B, 2, 576))) / np.sqrt(2)
        rx = (h_true * np.asarray(tx))[:, None] + noise.astype(np.complex64)
        m = csi_measure(cfg, jnp.asarray(rx))
        est = float(np.asarray(m["snr_db"]).mean())
        assert abs(est - snr_set) < 3.0, (snr_set, est)
    cqi_hi = int(np.asarray(m["cqi"])[0])
    assert cqi_hi >= 12  # 20 dB should map to a high CQI


def test_softmodem_loop_smoke():
    """Multi-slot scheduler loop end-to-end (tiny config)."""
    import contextlib, io
    from openairinterface5g_tpu.runtime import softmodem
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = softmodem.main(["-n", "4", "-u", "1", "-P", "6", "-m", "4",
                             "-s", "16", "-I", "6"])
    out = buf.getvalue()
    assert rc == 0 and "softmodem loop OK" in out, out


def test_autotest_single_case():
    """Autotest runner machinery on the fastest case."""
    import contextlib, io
    from openairinterface5g_tpu.sim import autotest
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = autotest.main(["--filter", "pucchsim-f0-1bit"])
    assert rc == 0 and "1/1 autotests passed" in buf.getvalue()
