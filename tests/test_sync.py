import numpy as np
import jax.numpy as jnp

from openairinterface5g_tpu.config import make_frame_params
from openairinterface5g_tpu.models.pbch import PbchConfig, ssb_generate
from openairinterface5g_tpu.models.sync import initial_sync, ssb_time_signal


def test_initial_sync_finds_cell():
    fp = make_frame_params(1, 24)  # small band, fft 512
    rng = np.random.default_rng(2)
    B = 4
    n_id = 321
    cfg = PbchConfig(n_id=n_id, i_ssb=0)
    payload = rng.integers(0, 2, (B, 32)).astype(np.int8)
    tile = ssb_generate(cfg, jnp.asarray(payload))
    ssb = np.asarray(ssb_time_signal(fp, tile))
    # embed at a random offset in a noisy stream, add phase + AWGN (-3 dB)
    off = 777
    n_total = ssb.shape[-1] + 2000
    sigma = float(np.sqrt(np.mean(np.abs(ssb) ** 2))) * 10 ** (3.0 / 20)
    stream = sigma * (rng.standard_normal((B, n_total)) + 1j * rng.standard_normal((B, n_total))) / np.sqrt(2)
    stream = stream.astype(np.complex64)
    stream[:, off: off + ssb.shape[-1]] += ssb * np.exp(1j * 0.4)
    out = initial_sync(fp, jnp.asarray(stream))
    np.testing.assert_array_equal(np.asarray(out["t0"]), off)
    np.testing.assert_array_equal(np.asarray(out["n_id"]), n_id)


def test_sync_metric_low_on_noise():
    fp = make_frame_params(1, 24)
    rng = np.random.default_rng(3)
    stream = (rng.standard_normal((2, 5000)) + 1j * rng.standard_normal((2, 5000))).astype(np.complex64)
    out = initial_sync(fp, jnp.asarray(stream))
    # pure-noise PSS metric should be far below a synced one (~ area ratio)
    assert float(np.asarray(out["pss_metric"]).max()) < 100.0


def test_initial_sync_with_cfo_and_pbch():
    """+-5 ppm CFO at 3.5 GHz (17.5 kHz ~ 0.58 SCS at mu=1): integer-SCS
    scan + fractional PSS estimate recover the offset, and the PBCH
    decodes from the corrected stream."""
    import jax
    from openairinterface5g_tpu.models.pbch import ssb_receive
    from openairinterface5g_tpu.models.sync import SSB_SC
    from openairinterface5g_tpu.sim.channel import apply_cfo

    fp = make_frame_params(1, 24)
    rng = np.random.default_rng(7)
    B = 2
    n_id = 111
    cfg = PbchConfig(n_id=n_id, i_ssb=0)
    payload = rng.integers(0, 2, (B, 32)).astype(np.int8)
    tile = ssb_generate(cfg, jnp.asarray(payload))
    ssb = np.asarray(ssb_time_signal(fp, tile))
    off = 400
    n_total = ssb.shape[-1] + 1500
    sigma = float(np.sqrt(np.mean(np.abs(ssb) ** 2))) * 10 ** (-10.0 / 20)
    stream = sigma * (rng.standard_normal((B, n_total))
                      + 1j * rng.standard_normal((B, n_total))) / np.sqrt(2)
    stream = stream.astype(np.complex64)
    stream[:, off: off + ssb.shape[-1]] += ssb
    for ppm in (5.0, -5.0):
        cfo_true = ppm * 1e-6 * 3.5e9
        rx = apply_cfo(jnp.asarray(stream), fp.sample_rate, cfo_true)
        out = initial_sync(fp, rx, cfo_scan=2)
        np.testing.assert_array_equal(np.asarray(out["t0"]), off)
        np.testing.assert_array_equal(np.asarray(out["n_id"]), n_id)
        cfo_hat = np.asarray(out["cfo_hz"])
        assert np.all(np.abs(cfo_hat - cfo_true) < 0.02 * fp.scs), (
            cfo_hat, cfo_true)
        # PBCH decode from the corrected stream at the found timing
        work = np.asarray(out["samples_corrected"])
        t0 = int(np.asarray(out["t0"])[0])
        syms = work[:, t0: t0 + 4 * fp.fft_size].reshape(B, 4, fp.fft_size)
        grid = np.fft.fft(syms, axis=-1) / np.sqrt(fp.fft_size)
        start = (fp.fft_size - SSB_SC) // 2
        bins = (start + np.arange(SSB_SC) - fp.fft_size // 2) % fp.fft_size
        rx_tile = jnp.asarray(grid[..., bins])
        got, ok = ssb_receive(cfg, rx_tile[:, None])
        assert bool(np.asarray(ok).all())
        assert np.array_equal(np.asarray(got), payload)


def test_timing_drift_estimate():
    from openairinterface5g_tpu.models.sync import timing_drift_estimate
    n = 256
    rng = np.random.default_rng(1)
    for shift in (0, 3, -4):
        h = np.exp(-2j * np.pi * shift * np.arange(n) / n)
        h = h * (1.0 + 0.05 * rng.standard_normal(n))
        est = int(np.asarray(timing_drift_estimate(jnp.asarray(h[None]))[0]))
        assert est == shift, (est, shift)
