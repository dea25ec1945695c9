"""NB-IoT PHY core: NPSS/NSSS sync, NPBCH, NPDSCH/NPUSCH with
repetition combining, NPRACH hopping-pattern detection."""
import numpy as np
import jax.numpy as jnp

from openairinterface5g_tpu.lte import nbiot


def _noise(rng, shape, s):
    return s * jnp.asarray((rng.normal(size=shape)
                            + 1j * rng.normal(size=shape)
                            ).astype(np.complex64))


def test_npss_nsss_sync():
    rng = np.random.default_rng(0)
    g = jnp.zeros((2, 14, 12), jnp.complex64)
    g = nbiot.npss_insert(g) + _noise(rng, (2, 14, 12), 0.3)
    m = np.asarray(nbiot.npss_detect(g))
    assert (m > 0.5).all(), m
    m0 = np.asarray(nbiot.npss_detect(_noise(rng, (2, 14, 12), 0.3)))
    assert (m0 < 0.2).all(), m0

    n_id = 257
    g2 = nbiot.nsss_insert(jnp.zeros((2, 14, 12), jnp.complex64), n_id, 0)
    g2 = g2 + _noise(rng, (2, 14, 12), 0.3)
    ids, metric = nbiot.nsss_identify(g2, range(0, 504, 7))  # incl. 257? no
    ids_full, _ = nbiot.nsss_identify(g2, range(250, 265))
    assert (np.asarray(ids_full) == n_id).all()


def test_npbch_repetition_gain():
    rng = np.random.default_rng(1)
    cfg = nbiot.NbConfig(n_id=11, n_reps=8)
    mib = jnp.asarray(rng.integers(0, 2, (4, nbiot.MIB_NB_BITS)
                                   ).astype(np.int8))
    tiles = nbiot.npbch_tx(cfg, mib)
    # heavy noise: single subframe fails, 8-rep combining succeeds
    noisy = tiles + _noise(rng, tiles.shape, 1.5)
    out = nbiot.npbch_rx(cfg, noisy)
    assert np.asarray(out["ok"]).all()
    assert (np.asarray(out["mib_bits"]) == np.asarray(mib)).all()
    one = nbiot.npbch_rx(nbiot.NbConfig(n_id=11, n_reps=1), noisy[:, :1])
    assert not np.asarray(one["ok"]).all()


def test_npdsch_npusch_roundtrip():
    rng = np.random.default_rng(2)
    for ul in (False, True):
        cfg = nbiot.NbSchConfig(tbs=256, n_sf=2, n_reps=4, rnti=0x2E2,
                                ul=ul)
        tb = jnp.asarray(rng.integers(0, 2, (2, cfg.tbs)).astype(np.int8))
        tiles = nbiot.nbsch_tx(cfg, tb)
        noisy = tiles + _noise(rng, tiles.shape, 0.6)
        out = nbiot.nbsch_rx(cfg, noisy)
        assert np.asarray(out["ok"]).all(), ("ul" if ul else "dl")
        assert (np.asarray(out["tb_bits"]) == np.asarray(tb)).all()


def test_nprach_detection():
    rng = np.random.default_rng(3)
    cfg = nbiot.NprachConfig()
    for n0 in (0, 5, 11):
        tx = nbiot.nprach_tx(cfg, n0, batch=2)
        noisy = tx + _noise(rng, tx.shape, 0.25)
        out = nbiot.nprach_detect(cfg, noisy)
        assert np.asarray(out["detected"]).all()
        assert (np.asarray(out["n_init"]) == n0).all()
    dtx = nbiot.nprach_detect(cfg, _noise(rng, (2, 8, 12), 0.25))
    assert not np.asarray(dtx["detected"]).any()
