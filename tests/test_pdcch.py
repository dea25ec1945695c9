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


def test_interleaved_coreset_mapping_properties():
    """Interleaver is a bijection; CCE PRB sets are disjoint; AL covers L*6 PRBs."""
    from openairinterface5g_tpu.models.pdcch import CoresetConfig
    cs = CoresetConfig(n_prb=48, interleaved=True, reg_bundle_size=6,
                       interleaver_rows=2, shift=3)
    f = cs.bundle_perm()
    assert sorted(f.tolist()) == list(range(len(f)))
    all_prbs = []
    for cce in range(cs.n_cce):
        prbs = cs.cce_prbs([cce])
        assert len(prbs) == 6
        all_prbs.extend(prbs.tolist())
    assert sorted(all_prbs) == list(range(48))
    # bundle size 2 with 6 rows also valid
    cs2 = CoresetConfig(n_prb=24, interleaved=True, reg_bundle_size=2,
                        interleaver_rows=6, shift=0)
    assert sorted(cs2.bundle_perm().tolist()) == list(range(12))


def test_pdcch_interleaved_roundtrip():
    from openairinterface5g_tpu.models.pdcch import (CoresetConfig, DciConfig,
                                                     pdcch_rx, pdcch_tx_grid)
    cs = CoresetConfig(n_prb=48, interleaved=True, reg_bundle_size=6,
                       interleaver_rows=2, shift=1)
    cfg = DciConfig(A=39, aggregation_level=4, coreset=cs, cce_index=2)
    rng = np.random.default_rng(3)
    B = 4
    payload = jnp.asarray(rng.integers(0, 2, (B, 39)).astype(np.int8))
    tx = pdcch_tx_grid(cfg, payload)
    noise = 0.05 * jnp.asarray(
        (rng.standard_normal((B, 2, tx.shape[-1]))
         + 1j * rng.standard_normal((B, 2, tx.shape[-1]))).astype(np.complex64))
    rx = tx[:, None] + noise
    out, ok = pdcch_rx(cfg, rx)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))


def test_blind_search_finds_nonzero_candidate():
    """DCI at a non-zero USS candidate CCE is found by the blind search."""
    from openairinterface5g_tpu.models.pdcch import (
        CoresetConfig, DciConfig, blind_search, pdcch_tx_grid,
        search_space_candidates)
    cs = CoresetConfig(n_prb=48, interleaved=True, reg_bundle_size=6,
                       interleaver_rows=2)
    rnti = 0x4567
    cands = search_space_candidates(cs, 2, 4, rnti=rnti, slot=1, css=False)
    cce0 = cands[1]
    cfg = DciConfig(A=20, aggregation_level=2, rnti=rnti, coreset=cs,
                    cce_index=cce0)
    rng = np.random.default_rng(4)
    B = 2
    payload = jnp.asarray(rng.integers(0, 2, (B, 20)).astype(np.int8))
    tx = pdcch_tx_grid(cfg, payload, slot=1)
    rx = tx[:, None]  # clean, 1 rx ant
    out, found, al = blind_search(rx, A=20, rnti=rnti, coreset=cs, slot=1,
                                  aggregation_levels=(1, 2, 4),
                                  candidates_per_al=(4, 4, 2), css=False)
    assert bool(np.asarray(found).all())
    assert (np.asarray(al) == 2).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))


def test_pdcch_fading_channel_interpolated_chest():
    """DCI blind decode through a frequency-selective channel: the
    per-PRB pilot interpolation must track |H(f)| variation across the
    CORESET (round-3 nearest-pilot chest was unverified under fading)."""
    import jax
    from openairinterface5g_tpu.models.pdcch import DciConfig, pdcch_tx_grid, blind_search

    B, n_prb, A, rnti = 4, 48, 39, 0x5A5A
    cfg = DciConfig(A=A, aggregation_level=8, rnti=rnti, n_id=7,
                    coreset_prb=n_prb)
    rng = np.random.default_rng(11)
    payload = jnp.asarray(rng.integers(0, 2, (B, A)).astype(np.int8))
    tx = pdcch_tx_grid(cfg, payload, slot=3)
    # 3-tap frequency-selective channel -> H varies over the 576 SCs
    n_sc = 12 * n_prb
    taps = (rng.standard_normal((B, 3)) + 1j * rng.standard_normal((B, 3))
            ) / np.sqrt(6)
    f = np.arange(n_sc)[None, :, None] / 64.0
    H = (taps[:, None, :] * np.exp(-2j * np.pi * f
                                   * np.arange(3)[None, None, :])).sum(-1)
    y = tx * jnp.asarray(H.astype(np.complex64))
    y = y + 0.25 * (jax.random.normal(jax.random.PRNGKey(5), y.shape)
                    + 1j * jax.random.normal(jax.random.PRNGKey(6), y.shape))
    bits, found, al = blind_search(y[:, None, :], A, rnti, n_id=7, slot=3,
                                   coreset_prb=n_prb)
    assert bool(np.asarray(found).all())
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(payload))
