import numpy as np
import jax.numpy as jnp
import pytest

from openairinterface5g_tpu.coding import polar, small_block
from openairinterface5g_tpu.coding.crc import crc_attach


def _polar_transform_np(u):
    """Reference O(N^2) polar transform: x = u @ G_N over GF(2)."""
    N = len(u)
    x = u.copy()
    m = 1
    while m < N:
        for start in range(0, N, 2 * m):
            x[start:start + m] ^= x[start + m:start + 2 * m]
        m *= 2
    return x


def test_polar_transform_matches_reference():
    rng = np.random.default_rng(0)
    for N in (8, 64, 256):
        u = rng.integers(0, 2, N).astype(np.int8)
        got = np.asarray(polar.polar_transform(jnp.asarray(u[None]))[0])
        np.testing.assert_array_equal(got, _polar_transform_np(u))


def test_params_pbch_shape():
    # PBCH: A=32 payload + CRC24C -> K=56, E=864, n_max=9, IL=1
    p = polar.polar_params(K=56, E=864, n_max=9, i_il=True)
    assert p.N == 512
    assert p.mode == "repetition"
    assert sum(p.info_mask) == 56
    assert len(p.rm_indices) == 864


@pytest.mark.parametrize("K,E,n_max,i_il,snr_db", [
    (56, 864, 9, True, -6.0),    # PBCH-like, heavy repetition
    (40, 108, 9, True, 2.0),     # DCI-like
    (31, 54, 10, False, 6.0),    # UCI-like (shortening, high rate)
])
def test_polar_encode_scl_decode_roundtrip(K, E, n_max, i_il, snr_db):
    p = polar.polar_params(K=K, E=E, n_max=n_max, i_il=i_il)
    rng = np.random.default_rng(K * 7 + E)
    B = 4
    A = K - 24 if K > 30 else K - 11
    crc_name = "24C" if K - A == 24 else "11"
    payload = rng.integers(0, 2, size=(B, A)).astype(np.int8)
    with_crc = crc_attach(jnp.asarray(payload), crc_name)
    e = polar.encode(p, with_crc)
    assert e.shape == (B, E)
    tx = 1.0 - 2.0 * np.asarray(e).astype(np.float32)
    sigma = 10 ** (-snr_db / 20)
    y = tx + sigma * rng.standard_normal(tx.shape).astype(np.float32)
    llr = jnp.asarray(2.0 * y / sigma**2)
    bits, ok = polar.decode_with_crc(p, llr, crc_name, list_size=8)
    assert bool(ok.all()), "CRC selection failed"
    np.testing.assert_array_equal(np.asarray(bits), payload)


def test_polar_uci_pc_bits_roundtrip():
    # UCI 12 <= A <= 19: CRC6 + 3 PC bits
    A, E = 16, 240
    K = A + 6
    p = polar.polar_params(K=K, E=E, n_max=10, i_il=False, n_pc=3, n_pc_wm=0, i_bil=True)
    rng = np.random.default_rng(5)
    B = 4
    payload = rng.integers(0, 2, size=(B, A)).astype(np.int8)
    with_crc = crc_attach(jnp.asarray(payload), "6")
    e = polar.encode(p, with_crc)
    tx = 1.0 - 2.0 * np.asarray(e).astype(np.float32)
    sigma = 10 ** (-1.0 / 20)
    y = tx + sigma * rng.standard_normal(tx.shape).astype(np.float32)
    bits, ok = polar.decode_with_crc(p, jnp.asarray(2 * y / sigma**2), "6", list_size=8)
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), payload)


def test_small_block_roundtrip():
    rng = np.random.default_rng(3)
    for K in (3, 6, 7, 11):
        bits = rng.integers(0, 2, size=(8, K)).astype(np.int8)
        cw = small_block.encode(jnp.asarray(bits))
        assert cw.shape == (8, 32)
        llr = (1.0 - 2.0 * np.asarray(cw).astype(np.float32)) * 4.0
        sigma = 10 ** (4.0 / 20)  # SNR -4 dB equivalent noise on unit symbols
        llr_noisy = llr + rng.standard_normal(llr.shape).astype(np.float32)
        dec = small_block.decode(jnp.asarray(llr_noisy), K)
        np.testing.assert_array_equal(np.asarray(dec), bits)
