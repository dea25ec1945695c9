import numpy as np
import jax.numpy as jnp
import pytest

from openairinterface5g_tpu.models.pdcch import (
    DciConfig, dci_decode, dci_encode, pdcch_rx, pdcch_tx_grid,
)


def test_dci_encode_decode_noiseless():
    cfg = DciConfig(A=39, aggregation_level=4, rnti=0xC001)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, (3, cfg.A)).astype(np.int8)
    e = dci_encode(cfg, jnp.asarray(payload))
    llr = (1.0 - 2.0 * np.asarray(e).astype(np.float32)) * 8
    bits, ok = dci_decode(cfg, jnp.asarray(llr))
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), payload)


def test_dci_wrong_rnti_fails():
    cfg = DciConfig(A=39, aggregation_level=2, rnti=0xC001)
    payload = jnp.zeros((2, cfg.A), jnp.int8)
    e = dci_encode(cfg, payload)
    llr = (1.0 - 2.0 * np.asarray(e).astype(np.float32)) * 8
    wrong = DciConfig(A=39, aggregation_level=2, rnti=0xC002)
    _, ok = dci_decode(wrong, jnp.asarray(llr))
    assert not bool(ok.any())


@pytest.mark.parametrize("al,snr_db", [(2, 4.0), (8, -2.0)])
def test_pdcch_grid_roundtrip(al, snr_db):
    cfg = DciConfig(A=39, aggregation_level=al, rnti=0x5555, coreset_prb=6 * al)
    rng = np.random.default_rng(al)
    B = 4
    payload = rng.integers(0, 2, (B, cfg.A)).astype(np.int8)
    tx = pdcch_tx_grid(cfg, jnp.asarray(payload))
    sigma = 10 ** (-snr_db / 20)
    noise = (rng.standard_normal((B, 2) + tx.shape[1:])
             + 1j * rng.standard_normal((B, 2) + tx.shape[1:])) / np.sqrt(2)
    rx = tx[:, None] * np.exp(1j * 0.3) + sigma * noise.astype(np.complex64)
    bits, ok = pdcch_rx(cfg, jnp.asarray(rx))
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), payload)


def test_dci_blind_search():
    from openairinterface5g_tpu.models.pdcch import blind_search, pdcch_tx_grid
    rng = np.random.default_rng(7)
    B = 3
    A, rnti = 39, 0xABCD
    cfg = DciConfig(A=A, aggregation_level=4, rnti=rnti, coreset_prb=48)
    payload = rng.integers(0, 2, (B, A)).astype(np.int8)
    grid = pdcch_tx_grid(cfg, jnp.asarray(payload))  # AL4 at CCE 0
    noise = 0.1 * (rng.standard_normal((B, 1) + grid.shape[1:])
                   + 1j * rng.standard_normal((B, 1) + grid.shape[1:]))
    rx = grid[:, None] + jnp.asarray(noise.astype(np.complex64))
    bits, found, al = blind_search(rx, A, rnti, coreset_prb=48)
    assert bool(found.all())
    np.testing.assert_array_equal(np.asarray(al), 4)
    np.testing.assert_array_equal(np.asarray(bits), payload)
