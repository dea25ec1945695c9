"""PRS positioning: staircase TX + UE ToA estimation / RSTD."""
import jax.numpy as jnp
import numpy as np

from openairinterface5g_tpu.models.prs import PrsConfig, prs_toa, prs_tx_grid, rstd


def _delayed_rx(cfg, n_sc, fft_size, delay_samples, rng, n_rx=2, snr=20.0):
    tile = prs_tx_grid(cfg, 1, n_sc)                  # (1, S, n_sc)
    k = jnp.arange(n_sc)
    phase = jnp.exp(-2j * np.pi * k * delay_samples / fft_size)
    h = jnp.asarray((rng.normal(size=(1, n_rx, 1, 1))
                     + 1j * rng.normal(size=(1, n_rx, 1, 1))
                     ).astype(np.complex64))
    rx = h * tile[:, None] * phase[None, None, None, :]
    sigma = float(10 ** (-snr / 20))
    rx = rx + sigma * jnp.asarray(
        (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape)
         ).astype(np.complex64))
    return rx


def test_prs_toa_accuracy():
    cfg = PrsConfig(n_prb=24, comb_size=4, n_symbols=4, n_id_prs=42)
    n_sc, fft = 288, 512
    rng = np.random.default_rng(0)
    for true_delay in (0.0, 3.0, 7.25, -2.5, 12.75):
        rx = _delayed_rx(cfg, n_sc, fft, true_delay, rng)
        out = prs_toa(cfg, rx, fft)
        est = float(np.asarray(out["toa_samples"])[0])
        # sub-sample accuracy: the 288-SC aperture resolves ~fft/288
        assert abs(est - true_delay) < 0.5, (true_delay, est)


def test_prs_rstd_two_trps():
    """Two TRPs with different PRS IDs and delays -> RSTD recovers the
    inter-site time difference."""
    rng = np.random.default_rng(1)
    n_sc, fft = 288, 512
    cfg_a = PrsConfig(n_prb=24, comb_size=4, n_symbols=4, n_id_prs=10)
    cfg_b = PrsConfig(n_prb=24, comb_size=4, n_symbols=4, n_id_prs=77)
    rx_a = _delayed_rx(cfg_a, n_sc, fft, 5.0, rng)
    rx_b = _delayed_rx(cfg_b, n_sc, fft, 9.5, rng)
    ta = prs_toa(cfg_a, rx_a, fft)["toa_samples"]
    tb = prs_toa(cfg_b, rx_b, fft)["toa_samples"]
    d = float(np.asarray(rstd(cfg_a, ta, tb))[0])
    assert abs(d - (5.0 - 9.5)) < 0.5, d
    # cross-ID rejection: decoding TRP B's signal with TRP A's ID gives
    # a noise-like profile (no dominant peak)
    wrong = prs_toa(cfg_a, rx_b, fft)
    right = prs_toa(cfg_b, rx_b, fft)
    assert float(np.asarray(right["peak_power"])[0]) > \
        4 * float(np.asarray(wrong["peak_power"])[0])
