"""LTE PUCCH 1/1a/1b + MIB pack/unpack tests."""
import numpy as np
import jax.numpy as jnp


def _fade_rx(rng, grid, n_rx, noise):
    B = grid.shape[0]
    n_sc = grid.shape[-1]
    h = jnp.asarray((rng.normal(size=(B, n_rx, 1, 1))
                     + 1j * rng.normal(size=(B, n_rx, 1, 1))
                     ).astype(np.complex64)) / np.sqrt(2)
    n = noise * jnp.asarray(
        (rng.normal(size=(B, n_rx, 14, n_sc))
         + 1j * rng.normal(size=(B, n_rx, 14, n_sc))).astype(np.complex64))
    return h * grid[:, None] + n


def test_pucch1a_ack_nack():
    from openairinterface5g_tpu.lte.pucch import (LtePucch1Config, pucch1_rx,
                                                  pucch1_tx)
    rng = np.random.default_rng(0)
    cfg = LtePucch1Config(n_rb=25, cell_id=7, prb=1, n_oc=0, cs0=0, n_rx=2)
    bits = jnp.asarray([[0], [1], [0], [1]], jnp.int8)
    rx = _fade_rx(rng, pucch1_tx(cfg, bits), 2, 0.2)
    out = pucch1_rx(cfg, rx, n_bits=1)
    assert bool(jnp.all(out["bits"] == bits))
    assert bool(np.all(np.asarray(out["detected"])))


def test_pucch1b_qpsk_and_dtx():
    from openairinterface5g_tpu.lte.pucch import (LtePucch1Config, pucch1_rx,
                                                  pucch1_tx)
    rng = np.random.default_rng(1)
    cfg = LtePucch1Config(n_rb=25, cell_id=17, prb=3, n_oc=2, cs0=5, n_rx=2)
    bits = jnp.asarray(rng.integers(0, 2, (4, 2)).astype(np.int8))
    rx = _fade_rx(rng, pucch1_tx(cfg, bits), 2, 0.15)
    out = pucch1_rx(cfg, rx, n_bits=2)
    assert bool(jnp.all(out["bits"] == bits))
    # DTX: noise only must NOT be detected
    noise_only = 0.15 * jnp.asarray(
        (rng.normal(size=(4, 2, 14, 300))
         + 1j * rng.normal(size=(4, 2, 14, 300))).astype(np.complex64))
    assert not bool(np.any(np.asarray(pucch1_rx(cfg, noise_only, 2)["detected"])))


def test_pucch1_user_separation():
    """Two UEs on the same PRB separated by cyclic shift + cover."""
    from openairinterface5g_tpu.lte.pucch import (LtePucch1Config, pucch1_rx,
                                                  pucch1_tx)
    rng = np.random.default_rng(2)
    a = LtePucch1Config(n_rb=25, cell_id=7, prb=1, n_oc=0, cs0=0, n_rx=1)
    b = LtePucch1Config(n_rb=25, cell_id=7, prb=1, n_oc=1, cs0=6, n_rx=1)
    bits_a = jnp.asarray([[1]], jnp.int8)
    bits_b = jnp.asarray([[0]], jnp.int8)
    grid = pucch1_tx(a, bits_a) + pucch1_tx(b, bits_b)
    rx = _fade_rx(rng, grid, 1, 0.1)
    out_a = pucch1_rx(a, rx, n_bits=1)
    out_b = pucch1_rx(b, rx, n_bits=1)
    assert int(out_a["bits"][0, 0]) == 1
    assert int(out_b["bits"][0, 0]) == 0


def test_lte_mib_pack_unpack():
    from openairinterface5g_tpu.lte.pbch import mib_pack, mib_unpack
    bits = mib_pack(n_rb=50, sfn=512, phich_duration=1, phich_resource=2)
    assert bits.shape == (24,)
    out = mib_unpack(bits)
    assert out["n_rb"] == 50
    assert out["sfn_msb8"] == 512 >> 2
    assert out["phich_duration"] == 1 and out["phich_resource"] == 2
