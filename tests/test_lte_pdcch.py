"""LTE control channels: PCFICH, PHICH, PDCCH blind decode."""
import numpy as np
import jax.numpy as jnp


def test_pcfich_roundtrip():
    from openairinterface5g_tpu.lte.pdcch import pcfich_decode, pcfich_encode
    rng = np.random.default_rng(0)
    for cfi in (1, 2, 3):
        syms = pcfich_encode(cfi, subframe=3, cell_id=7)
        h = jnp.asarray((rng.normal(size=(2, 2, 1))
                         + 1j * rng.normal(size=(2, 2, 1))).astype(np.complex64))
        y = h * syms[None, None] + 0.1 * jnp.asarray(
            (rng.normal(size=(2, 2, 16))
             + 1j * rng.normal(size=(2, 2, 16))).astype(np.complex64))
        out = pcfich_decode(y, jnp.broadcast_to(h, (2, 2, 16)), 3, 7)
        assert np.all(np.asarray(out) == cfi)


def test_phich_roundtrip():
    from openairinterface5g_tpu.lte.pdcch import phich_decode, phich_encode
    rng = np.random.default_rng(1)
    for ack in (0, 1):
        syms = phich_encode(ack, n_seq=2)
        h = jnp.asarray((rng.normal(size=(1, 2, 1))
                         + 1j * rng.normal(size=(1, 2, 1))).astype(np.complex64))
        y = h * syms[None, None] + 0.2 * jnp.asarray(
            (rng.normal(size=(1, 2, 12))
             + 1j * rng.normal(size=(1, 2, 12))).astype(np.complex64))
        out = phich_decode(y, jnp.broadcast_to(h, (1, 2, 12)), n_seq=2)
        assert int(np.asarray(out)[0]) == ack


def test_pdcch_blind_decode():
    from openairinterface5g_tpu.lte.pdcch import (pdcch_blind_decode,
                                                  pdcch_tx_symbol0)
    rng = np.random.default_rng(2)
    n_rb, cell_id, sf, rnti, A = 25, 7, 1, 0x5678, 27
    payload = jnp.asarray(rng.integers(0, 2, (2, A)).astype(np.int8))
    y0 = pdcch_tx_symbol0(n_rb, cell_id, sf, payload, rnti,
                          aggregation=4, cce0=0)
    n_sc = 12 * n_rb
    h = jnp.asarray((rng.normal(size=(2, 1, 1))
                     + 1j * rng.normal(size=(2, 1, 1))).astype(np.complex64))
    y = h * y0[:, None] + 0.05 * jnp.asarray(
        (rng.normal(size=(2, 1, n_sc))
         + 1j * rng.normal(size=(2, 1, n_sc))).astype(np.complex64))
    pl, found, level = pdcch_blind_decode(
        y, jnp.broadcast_to(h, (2, 1, n_sc)), n_rb, cell_id, sf, rnti, A)
    assert bool(np.all(np.asarray(found)))
    # a stronger-than-needed candidate may decode first (prefix CCEs of
    # the AL-4 transmission form valid lower-AL codewords at high SNR) —
    # what matters is the payload
    assert np.all(np.isin(np.asarray(level), (1, 2, 4)))
    assert bool(jnp.all(pl == payload))
    # wrong RNTI -> CRC mask mismatch -> not found
    _, found_bad, _ = pdcch_blind_decode(
        y, jnp.broadcast_to(h, (2, 1, n_sc)), n_rb, cell_id, sf, 0x1111, A)
    assert not bool(np.any(np.asarray(found_bad)))
