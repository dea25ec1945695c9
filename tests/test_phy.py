import numpy as np
import jax.numpy as jnp
import pytest

from openairinterface5g_tpu.config import make_frame_params
from openairinterface5g_tpu.phy import modulation as mod
from openairinterface5g_tpu.phy import llr as llr_mod
from openairinterface5g_tpu.phy.ofdm import (
    extract_from_grid, map_to_grid, ofdm_demodulate, ofdm_modulate,
)
from openairinterface5g_tpu.phy.scrambling import gold_sequence


def gold_ref(cinit, length):
    """Bit-serial reference Gold generator (TS 38.211 5.2.1)."""
    Nc = 1600
    n = Nc + length
    x1 = np.zeros(n + 31, dtype=np.int64)
    x2 = np.zeros(n + 31, dtype=np.int64)
    x1[0] = 1
    for i in range(31):
        x2[i] = (cinit >> i) & 1
    for i in range(n):
        x1[i + 31] = (x1[i + 3] + x1[i]) % 2
        x2[i + 31] = (x2[i + 3] + x2[i + 2] + x2[i + 1] + x2[i]) % 2
    return ((x1[Nc:Nc + length] + x2[Nc:Nc + length]) % 2).astype(np.int8)


@pytest.mark.parametrize("cinit", [1, 0x1234567, (0x1234 << 15) + 3])
def test_gold_sequence_matches_reference(cinit):
    got = np.asarray(gold_sequence(jnp.uint32(cinit), 200))
    np.testing.assert_array_equal(got, gold_ref(cinit, 200))


@pytest.mark.parametrize("qm", [1, 2, 4, 6, 8])
def test_constellation_unit_power(qm):
    c = mod.constellation(qm)
    assert abs(np.mean(np.abs(c) ** 2) - 1.0) < 1e-6


@pytest.mark.parametrize("qm", [2, 4, 6, 8])
def test_llr_hard_decision_matches_bits(qm):
    rng = np.random.default_rng(qm)
    bits = rng.integers(0, 2, size=(3, 40 * qm)).astype(np.int8)
    syms = mod.modulate(jnp.asarray(bits), qm)
    mag = jnp.ones(syms.shape, jnp.float32)
    llrs = llr_mod.llrs(syms, mag, qm)
    hard = (np.asarray(llrs) < 0).astype(np.int8)
    np.testing.assert_array_equal(hard, bits)


def test_layer_map_roundtrip():
    rng = np.random.default_rng(0)
    syms = jnp.asarray(rng.standard_normal((2, 12)) + 1j * rng.standard_normal((2, 12)))
    for L in (1, 2, 4):
        lm = mod.layer_map(syms, L)
        assert lm.shape == (2, L, 12 // L)
        back = mod.layer_demap(lm)
        np.testing.assert_allclose(np.asarray(back), np.asarray(syms))


def test_ofdm_roundtrip():
    fp = make_frame_params(1, 106)
    rng = np.random.default_rng(1)
    re = rng.standard_normal((2, 14, fp.n_sc)) + 1j * rng.standard_normal((2, 14, fp.n_sc))
    grid = map_to_grid(fp, jnp.asarray(re.astype(np.complex64)))
    tx = ofdm_modulate(fp, grid, slot=0)
    assert tx.shape[-1] == fp.samples_per_slot(0)
    grid_rx = ofdm_demodulate(fp, tx, slot=0)
    re_rx = extract_from_grid(fp, grid_rx)
    np.testing.assert_allclose(np.asarray(re_rx), re, atol=1e-3)


def test_frame_params_known_values():
    fp = make_frame_params(1, 273)  # 100 MHz @ 30 kHz
    assert fp.fft_size == 4096
    assert fp.sample_rate == 122_880_000.0
    assert fp.cp_samples == 288
    assert fp.cp0_samples == 352
    # mu=1: long CP at abs symbols 0 and 14 -> one per slot, slots equal,
    # and 2 slots exactly fill a 1 ms subframe
    assert fp.samples_per_slot(0) == fp.samples_per_slot(1) == 61440
    assert fp.samples_per_subframe == int(fp.sample_rate / 1000)


def test_tdl_los_models_power_normalized():
    """TDL-D/E Rician models: specular + Rayleigh tap power sums to ~1."""
    import jax
    from openairinterface5g_tpu.sim.channel import ChannelModel, apply_channel

    for name in ("TDLD", "TDLE"):
        m = ChannelModel(name, 1, 2, 61.44e6, delay_spread_ns=100)
        assert m.los_power_normalized() > 0.5  # K-factor makes LOS dominant
        tx = jnp.ones((16, 1, 2048), jnp.complex64)
        rx, h = apply_channel(m, jax.random.PRNGKey(0), tx)
        pw = float(np.mean(np.sum(np.abs(np.asarray(h)) ** 2, axis=-1)))
        assert 0.8 < pw < 1.2, (name, pw)
        assert rx.shape == (16, 2, 2048)


def test_smallblocktest_sim():
    from openairinterface5g_tpu.sim.smallblocktest import main

    assert main(["-k", "6", "-s", "2", "-n", "128"]) == 0
