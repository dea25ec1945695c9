import numpy as np
import jax
import jax.numpy as jnp

from openairinterface5g_tpu.models.pbch import (
    PbchConfig, pbch_decode, pbch_encode, ssb_generate, ssb_receive,
)


def test_pbch_encode_decode_noiseless():
    cfg = PbchConfig(n_id=41, i_ssb=2)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, (3, 32)).astype(np.int8)
    e = pbch_encode(cfg, jnp.asarray(payload))
    assert e.shape == (3, 864)
    llr = (1.0 - 2.0 * np.asarray(e).astype(np.float32)) * 8
    bits, ok = pbch_decode(cfg, jnp.asarray(llr))
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), payload)


def test_ssb_tile_structure():
    cfg = PbchConfig(n_id=7, i_ssb=1)
    payload = jnp.zeros((1, 32), jnp.int8)
    tile = ssb_generate(cfg, payload)
    assert tile.shape == (1, 4, 240)
    t = np.asarray(tile[0])
    # PSS present on symbol 0 center 127 SCs, zero elsewhere on symbol 0
    assert np.abs(t[0, 56:183]).min() > 0
    assert np.abs(t[0, :56]).max() == 0
    # symbols 1 and 3 fully occupied (PBCH+DMRS)
    assert np.abs(t[1]).min() > 0
    assert np.abs(t[3]).min() > 0


def test_ssb_end_to_end_awgn():
    cfg = PbchConfig(n_id=123, i_ssb=0)
    rng = np.random.default_rng(5)
    B = 4
    payload = rng.integers(0, 2, (B, 32)).astype(np.int8)
    tile = ssb_generate(cfg, jnp.asarray(payload))
    # 1 rx antenna, flat channel with phase + AWGN at ~ -4 dB SNR
    h = np.exp(1j * 0.7).astype(np.complex64)
    sigma = 10 ** (4.0 / 20)  # -4 dB SNR on unit-energy REs
    noise = (rng.standard_normal(tile.shape) + 1j * rng.standard_normal(tile.shape)) / np.sqrt(2)
    rx = (h * np.asarray(tile) + sigma * noise.astype(np.complex64))[:, None]
    bits, ok = ssb_receive(cfg, jnp.asarray(rx))
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), payload)


def test_ssb_wrong_cell_id_fails_crc():
    cfg = PbchConfig(n_id=123, i_ssb=0)
    payload = jnp.zeros((2, 32), jnp.int8)
    tile = ssb_generate(cfg, payload)
    wrong = PbchConfig(n_id=124, i_ssb=0)
    bits, ok = ssb_receive(wrong, tile[:, None])
    assert not bool(ok.any())
