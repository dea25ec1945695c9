import numpy as np
import pytest
import jax.numpy as jnp

from openairinterface5g_tpu.models.prach import PrachConfig, prach_rx, prach_tx


def test_prach_detection_awgn():
    cfg = PrachConfig(l_ra=839, roots=(129, 140), n_cs=13)
    rng = np.random.default_rng(0)
    B = 8
    n_pre = len(cfg.roots) * cfg.shifts_per_root
    pre = rng.integers(0, min(64, n_pre), B)
    tx = prach_tx(cfg, jnp.asarray(pre))
    # -14 dB per-sample SNR (prach has 839x processing gain)
    sigma = 10 ** (14.0 / 20)
    noise = (rng.standard_normal((B, 2, cfg.l_ra))
             + 1j * rng.standard_normal((B, 2, cfg.l_ra))) / np.sqrt(2)
    rx = tx[:, None] * np.exp(1j * 1.1) + sigma * noise.astype(np.complex64)
    out = prach_rx(cfg, jnp.asarray(rx))
    assert bool(out["detected"].all())
    np.testing.assert_array_equal(np.asarray(out["preamble"]), pre)


def test_prach_no_false_alarm():
    cfg = PrachConfig(l_ra=839, roots=(129,), n_cs=13)
    rng = np.random.default_rng(1)
    noise = (rng.standard_normal((8, 2, 839)) + 1j * rng.standard_normal((8, 2, 839))) / np.sqrt(2)
    out = prach_rx(cfg, jnp.asarray(noise.astype(np.complex64)))
    assert not bool(out["detected"].any())


def test_prach_delay_estimate():
    cfg = PrachConfig(l_ra=839, roots=(129,), n_cs=13)
    pre = jnp.asarray(np.array([5, 10]))
    tx = prach_tx(cfg, pre)
    # apply integer delay d in the 839-domain: phase ramp exp(-j2pi d k/L)
    d = 3
    ramp = np.exp(-2j * np.pi * d * np.arange(839) / 839).astype(np.complex64)
    rx = (np.asarray(tx) * ramp)[:, None]
    out = prach_rx(cfg, jnp.asarray(rx))
    assert bool(out["detected"].all())
    np.testing.assert_array_equal(np.asarray(out["preamble"]), np.asarray(pre))
    # delay in IFFT samples: d * n_ifft / l_ra ~ 3.66 -> 3 or 4
    delays = np.asarray(out["delay"])
    assert np.all((delays >= 3) & (delays <= 4))


@pytest.mark.parametrize("fmt", ["0", "3", "A2", "B4"])
def test_prach_time_domain_roundtrip(fmt):
    from openairinterface5g_tpu.models.prach import (PrachTdConfig,
                                                     prach_td_rx, prach_td_tx)
    cfg = PrachTdConfig(fmt=fmt, mu=1, sample_rate=61.44e6,
                        roots=(129, 140), n_cs=13 if fmt in "0123" else 11)
    rng = np.random.default_rng(17)
    B = 4
    pre = jnp.asarray(rng.integers(0, 8, (B,)).astype(np.int32))
    tx = prach_td_tx(cfg, pre)
    assert tx.shape == (B, cfg.n_samples)
    # delay by a few samples within the CP + AWGN at low SNR; 2 rx ants
    d = 5
    sig = float(np.mean(np.abs(np.asarray(tx)) ** 2))
    rx1 = jnp.pad(tx, ((0, 0), (d, 0)))[:, : cfg.n_samples]
    rx = jnp.stack([rx1, rx1 * np.complex64(0.8 - 0.3j)], axis=1)
    noise = np.sqrt(sig) * 0.5 * (
        rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape))
    rx = rx + jnp.asarray(noise.astype(np.complex64))
    out = prach_td_rx(cfg, rx)
    assert bool(np.asarray(out["detected"]).all())
    np.testing.assert_array_equal(np.asarray(out["preamble"]), np.asarray(pre))


def test_prach_td_no_signal_no_detection():
    from openairinterface5g_tpu.models.prach import PrachTdConfig, prach_td_rx
    cfg = PrachTdConfig(fmt="A2", mu=1, sample_rate=61.44e6)
    rng = np.random.default_rng(3)
    rx = jnp.asarray((rng.standard_normal((2, 2, cfg.n_samples))
                      + 1j * rng.standard_normal((2, 2, cfg.n_samples))
                      ).astype(np.complex64))
    out = prach_td_rx(cfg, rx)
    assert not bool(np.asarray(out["detected"]).any())


def test_restricted_type_a_shifts_properties():
    """38.211 §6.3.3.1 restricted type A: shifts stay inside L_RA, are
    N_CS-separated, and no preamble's Doppler alias (+-d_u) lands in
    another preamble's zero-correlation zone."""
    from openairinterface5g_tpu.models.prach import _du, cyclic_shifts
    L, ncs = 839, 68            # zeroCorrelationZoneConfig 8, type A
    checked = 0
    # logical roots 116+ have d_u >= N_CS (the table is CM-ordered;
    # early roots are unusable in restricted mode, like the reference)
    from openairinterface5g_tpu.models.prach import nr_roots
    for u in nr_roots(116, 8, 839):
        cvs = cyclic_shifts(u, L, ncs, restricted=1)
        if not cvs:
            continue
        checked += 1
        du = _du(u, L)
        assert all(0 <= c < L for c in cvs)
        zones = [(c, c + ncs) for c in cvs]
        for c in cvs:
            for alias in ((c + du) % L, (c - du) % L):
                for (a, b) in zones:
                    if (a, b) == (c, c + ncs):
                        continue
                    assert not (a <= alias < b), (u, c, alias, (a, b))
    assert checked >= 4


def test_restricted_detection_roundtrip():
    """TX/RX across every restricted-set preamble of a 2-root config."""
    import jax.numpy as jnp
    from openairinterface5g_tpu.models.prach import (PrachConfig, nr_roots,
                                                     prach_rx, prach_tx)
    cfg = PrachConfig(l_ra=839, roots=nr_roots(116, 4, 839), n_cs=68,
                      restricted=1, threshold=8.0)
    n = cfg.n_preambles
    assert n > 0
    pre = jnp.arange(n)
    tx = prach_tx(cfg, pre)
    out = prach_rx(cfg, tx[:, None, :])
    assert bool(np.asarray(out["detected"]).all())
    np.testing.assert_array_equal(np.asarray(out["preamble"]), np.arange(n))
