"""LTE PRACH (ZC-839, formats 0-3) detection tests."""
import numpy as np
import jax.numpy as jnp


def test_lte_prach_detection_and_delay():
    from openairinterface5g_tpu.lte.prach import LtePrachConfig, prach_rx, \
        prach_tx
    cfg = LtePrachConfig(format=0, root_sequence_index=22,
                         zero_correlation_zone=1)
    assert cfg.n_cs == 13 and len(cfg.roots) == 2
    rng = np.random.default_rng(0)
    idx = jnp.asarray([3, 17, 64 + 5])        # two roots' shift ranges
    tx = prach_tx(cfg, idx)
    noise = 0.3 * (rng.normal(size=(3, 2, 839))
                   + 1j * rng.normal(size=(3, 2, 839)))
    rx = tx[:, None] + jnp.asarray(noise.astype(np.complex64))
    out = prach_rx(cfg, rx)
    assert bool(np.all(np.asarray(out["detected"])))
    assert np.array_equal(np.asarray(out["preamble"]), np.asarray(idx))


def test_lte_prach_formats_and_roots():
    from openairinterface5g_tpu.lte.prach import FORMATS, LtePrachConfig
    for fmt, (tcp, tseq) in FORMATS.items():
        cfg = LtePrachConfig(format=fmt)
        assert cfg.durations_ts() == (tcp, tseq)
    # logical->physical root pairing: u and 839-u adjacent
    cfg = LtePrachConfig(root_sequence_index=0, n_roots=4)
    r = cfg.roots
    assert r[1] == 839 - r[0] and r[3] == 839 - r[2]


def test_lte_prach_dtx():
    from openairinterface5g_tpu.lte.prach import LtePrachConfig, prach_rx
    rng = np.random.default_rng(1)
    cfg = LtePrachConfig()
    noise = 0.3 * (rng.normal(size=(2, 2, 839))
                   + 1j * rng.normal(size=(2, 2, 839)))
    out = prach_rx(cfg, jnp.asarray(noise.astype(np.complex64)))
    assert not bool(np.any(np.asarray(out["detected"])))


def test_lte_srs_sounding():
    import jax.numpy as jnp
    import numpy as np
    from openairinterface5g_tpu.lte.srs import LteSrsConfig, srs_rx, srs_tx
    cfg = LteSrsConfig(n_rb=25, srs_rb=24, cell_id=7, cyclic_shift=3, n_rx=2)
    rng = np.random.default_rng(0)
    tx = srs_tx(cfg, batch=2)
    h = jnp.asarray((rng.normal(size=(2, 2, 1))
                     + 1j * rng.normal(size=(2, 2, 1))).astype(np.complex64))
    y = h * tx[:, None] + 0.05 * jnp.asarray(
        (rng.normal(size=(2, 2, 300))
         + 1j * rng.normal(size=(2, 2, 300))).astype(np.complex64))
    out = srs_rx(cfg, y)
    assert out["h"].shape == (2, 2, cfg.m_sc)
    # estimated channel ~ true flat channel
    err = jnp.mean(jnp.abs(out["h"] - h) ** 2) / jnp.mean(jnp.abs(h) ** 2)
    assert float(err) < 0.02
    assert float(jnp.min(out["snr_db"])) > 15.0
