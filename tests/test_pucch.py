import numpy as np
import jax.numpy as jnp
import pytest

from openairinterface5g_tpu.models.pucch import (
    Pucch0Config, Pucch2Config, pucch0_rx, pucch0_tx, pucch2_rx, pucch2_tx,
)


@pytest.mark.parametrize("n_bits", [1, 2])
def test_pucch0_roundtrip_awgn(n_bits):
    cfg = Pucch0Config(n_bits=n_bits, n_symbols=2)
    rng = np.random.default_rng(n_bits)
    B = 16
    uci = rng.integers(0, 1 << n_bits, B)
    tx = pucch0_tx(cfg, jnp.asarray(uci))
    sigma = 10 ** (2.0 / 20)  # -2 dB SNR
    noise = (rng.standard_normal((B, 1, cfg.n_symbols, 12))
             + 1j * rng.standard_normal((B, 1, cfg.n_symbols, 12))) / np.sqrt(2)
    rx = tx[:, None] * np.exp(1j * 0.5) + sigma * noise.astype(np.complex64)
    got, _ = pucch0_rx(cfg, jnp.asarray(rx))
    np.testing.assert_array_equal(np.asarray(got), uci)


@pytest.mark.parametrize("n_bits", [4, 11])
def test_pucch2_small_block_roundtrip(n_bits):
    cfg = Pucch2Config(n_bits=n_bits, n_prb=4)
    rng = np.random.default_rng(n_bits)
    B = 8
    uci = rng.integers(0, 2, (B, n_bits)).astype(np.int8)
    tx = pucch2_tx(cfg, jnp.asarray(uci))
    sigma = 10 ** (-0.0 / 20)
    noise = (rng.standard_normal((B, 1) + tx.shape[1:])
             + 1j * rng.standard_normal((B, 1) + tx.shape[1:])) / np.sqrt(2)
    rx = tx[:, None] + sigma * noise.astype(np.complex64)
    got, ok = pucch2_rx(cfg, jnp.asarray(rx))
    np.testing.assert_array_equal(np.asarray(got), uci)


def test_pucch2_polar_roundtrip():
    cfg = Pucch2Config(n_bits=16, n_prb=9)
    rng = np.random.default_rng(9)
    B = 4
    uci = rng.integers(0, 2, (B, 16)).astype(np.int8)
    tx = pucch2_tx(cfg, jnp.asarray(uci))
    sigma = 10 ** (-3.0 / 20)
    noise = (rng.standard_normal((B, 2) + tx.shape[1:])
             + 1j * rng.standard_normal((B, 2) + tx.shape[1:])) / np.sqrt(2)
    rx = tx[:, None] + sigma * noise.astype(np.complex64)
    got, ok = pucch2_rx(cfg, jnp.asarray(rx))
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(got), uci)


@pytest.mark.parametrize("n_bits", [1, 2])
def test_pucch1_roundtrip(n_bits):
    from openairinterface5g_tpu.models.pucch import Pucch1Config, pucch1_rx, pucch1_tx
    cfg = Pucch1Config(n_bits=n_bits, n_symbols=14)
    rng = np.random.default_rng(n_bits + 10)
    B = 16
    uci = rng.integers(0, 1 << n_bits, B)
    tx = pucch1_tx(cfg, jnp.asarray(uci))
    sigma = 10 ** (6.0 / 20)  # -6 dB per-RE SNR (heavy time spreading)
    noise = (rng.standard_normal((B, 2, 14, 12)) + 1j * rng.standard_normal((B, 2, 14, 12))) / np.sqrt(2)
    rx = tx[:, None] * np.exp(1j * 0.9) + sigma * noise.astype(np.complex64)
    got, _ = pucch1_rx(cfg, jnp.asarray(rx))
    np.testing.assert_array_equal(np.asarray(got), uci)


@pytest.mark.parametrize("fmt,n_bits,n_prb,occ_len,pi2", [
    (3, 16, 2, 1, False),
    (3, 8, 1, 1, False),
    (3, 22, 4, 1, True),
    (4, 10, 1, 2, False),
    (4, 14, 1, 4, False),
])
def test_pucch34_loopback(fmt, n_bits, n_prb, occ_len, pi2):
    from openairinterface5g_tpu.models.pucch import Pucch34Config, pucch34_tx, pucch34_rx
    cfg = Pucch34Config(fmt=fmt, n_bits=n_bits, n_prb=n_prb,
                        occ_len=occ_len, pi2_bpsk=pi2, n_symbols=14)
    rng = np.random.default_rng(fmt * 100 + n_bits)
    B = 4
    uci = jnp.asarray(rng.integers(0, 2, (B, n_bits)).astype(np.int8))
    tx = pucch34_tx(cfg, uci)
    assert tx.shape == (B, 14, cfg.msc)
    # 2-rx AWGN with a flat random channel
    h = jnp.asarray((rng.standard_normal((B, 2, 1, 1))
                     + 1j * rng.standard_normal((B, 2, 1, 1))).astype(np.complex64))
    noise = 0.05 * jnp.asarray(
        (rng.standard_normal((B, 2, 14, cfg.msc))
         + 1j * rng.standard_normal((B, 2, 14, cfg.msc))).astype(np.complex64))
    rx = h * tx[:, None] + noise
    out, ok = pucch34_rx(cfg, rx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(uci))
    assert bool(np.asarray(ok).all())


def test_pucch4_occ_multiplexing():
    """Two users on the same PRB with different OCC indices separate."""
    from openairinterface5g_tpu.models.pucch import Pucch34Config, pucch34_tx, pucch34_rx
    rng = np.random.default_rng(7)
    B = 2
    cfgs = [Pucch34Config(fmt=4, n_bits=6, occ_len=2, occ_index=i) for i in range(2)]
    ucis = [jnp.asarray(rng.integers(0, 2, (B, 6)).astype(np.int8)) for _ in range(2)]
    txs = [pucch34_tx(c, u) for c, u in zip(cfgs, ucis)]
    rx = (txs[0] + txs[1])[:, None]  # same channel, superposed, 1 rx ant
    for c, u in zip(cfgs, ucis):
        out, ok = pucch34_rx(c, rx)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(u))


def test_pucch0_hopping_roundtrip():
    """F0 with group hopping + spec n_cs(ns,l) per-symbol shifts +
    intra-slot frequency hopping decodes through a BWP grid (hop-aware
    extraction), and the per-hop sequence groups actually differ."""
    from openairinterface5g_tpu.models.gnb import (_extract_pucch_tile,
                                                   place_pucch_tile)
    from openairinterface5g_tpu.phy.hopping import group_sequence_uv

    cfg = Pucch0Config(n_bits=2, n_symbols=2, start_symbol=12, slot=3,
                       hopping_id=41, group_hopping="enable",
                       intra_slot_hopping=True, second_hop_prb=20)
    u0, _ = group_sequence_uv(41, "enable", 3, 0)
    u1, _ = group_sequence_uv(41, "enable", 3, 1)
    assert (u0, u1) != (41 % 30, 41 % 30), "f_gh must move u off f_ss"
    rng = np.random.default_rng(7)
    B = 16
    uci = rng.integers(0, 4, B)
    tile = pucch0_tx(cfg, jnp.asarray(uci))         # (B, 2, 12)
    grid = jnp.zeros((B, 1, 14, 12 * 24), jnp.complex64)
    grid = place_pucch_tile(grid, tile, cfg, prb=2)
    rx_grid = grid.swapaxes(1, 1)                    # (B, L=1->R=1, ...)
    noise = (rng.standard_normal(rx_grid.shape)
             + 1j * rng.standard_normal(rx_grid.shape)) / np.sqrt(2)
    rx_grid = rx_grid + (10 ** (-3.0 / 20)) * noise.astype(np.complex64)
    rx0 = _extract_pucch_tile(rx_grid, cfg, prb=2)
    got, _ = pucch0_rx(cfg, rx0)
    np.testing.assert_array_equal(np.asarray(got), uci)


def test_pucch1_intra_slot_hopping_roundtrip():
    """F1 with intra-slot hopping: per-hop OCC lengths, per-symbol alpha."""
    from openairinterface5g_tpu.models.pucch import Pucch1Config, pucch1_rx, pucch1_tx

    cfg = Pucch1Config(n_bits=2, n_symbols=9, start_symbol=2, slot=5,
                       hopping_id=17, group_hopping="enable",
                       intra_slot_hopping=True, second_hop_prb=10,
                       occ_index=1)
    rng = np.random.default_rng(9)
    B = 16
    uci = rng.integers(0, 4, B)
    tx = pucch1_tx(cfg, jnp.asarray(uci))
    noise = (rng.standard_normal((B, 2) + tx.shape[1:])
             + 1j * rng.standard_normal((B, 2) + tx.shape[1:])) / np.sqrt(2)
    rx = tx[:, None] * np.exp(0.3j) + (10 ** (-0.0 / 20)) * noise.astype(np.complex64)
    got, _ = pucch1_rx(cfg, jnp.asarray(rx))
    np.testing.assert_array_equal(np.asarray(got), uci)


def test_sequence_hopping_v():
    """'disable' (sequence hopping) flips v per hop for long sequences
    only; 'neither' keeps (u, v) fixed (TS 38.211 6.3.2.2.1)."""
    from openairinterface5g_tpu.phy.hopping import group_sequence_uv

    vs = {group_sequence_uv(30 * 7 + 3, "disable", s, h, m_zc=144)[1]
          for s in range(20) for h in (0, 1)}
    assert vs == {0, 1}, "v must vary across hops for M_ZC >= 72"
    assert all(group_sequence_uv(3, "disable", s, 0, m_zc=12) == (3, 0)
               for s in range(4)), "short sequences force v = 0"
    assert group_sequence_uv(34, "neither", 9, 1) == (4, 0)
