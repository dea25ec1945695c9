"""Channel impairment models: HST Doppler phasor, CFO, phase noise."""
import numpy as np
import jax
import jax.numpy as jnp

from openairinterface5g_tpu.sim.channel import (ChannelModel, apply_cfo,
                                                apply_phase_noise,
                                                doppler_phasor)


def test_doppler_phasor_properties():
    """Unit modulus; instantaneous frequency bounded by f_D and sweeping
    through the HST trajectory (TS 38.104 G.3-1)."""
    m = ChannelModel("TDLA", 1, 1, 30.72e6, max_doppler_hz=300.0,
                     center_freq_hz=3.5e9)
    n = 1 << 15
    ph = np.asarray(doppler_phasor(m, jax.random.PRNGKey(0), n))
    np.testing.assert_allclose(np.abs(ph), 1.0, atol=1e-5)
    # phase increments stay within the max Doppler (+ trajectory slope)
    dphi = np.angle(ph[1:] * np.conj(ph[:1] * ph[:-1] / ph[:1]))
    inst_f = dphi * m.sample_rate / (2 * np.pi)
    assert np.max(np.abs(inst_f)) < 450.0          # ~f_D + d(fs*t)/dt term


def test_cfo_phasor_exact():
    fs, f = 1e6, 1234.0
    x = jnp.ones(1000, jnp.complex64)
    y = np.asarray(apply_cfo(x, fs, f))
    expect = np.exp(2j * np.pi * f * np.arange(1000) / fs)
    np.testing.assert_allclose(y, expect.astype(np.complex64), atol=1e-4)


def test_phase_noise_is_300hz_rotation():
    """The reference 'linear phase noise model' (phase_noise.c) is a
    continuous 300 Hz rotation."""
    fs = 61.44e6
    x = jnp.ones(4096, jnp.complex64)
    y = np.asarray(apply_phase_noise(x, fs))
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    np.testing.assert_allclose(dphi, 2 * np.pi * 300.0 / fs, rtol=1e-3)
