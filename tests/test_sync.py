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
