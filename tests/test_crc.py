import numpy as np
import jax.numpy as jnp
import pytest

from openairinterface5g_tpu.coding.crc import CRC_POLYS, crc_attach, crc_compute, crc_ok


def crc_bitwise(bits, name):
    """Straightforward shift-register CRC (spec definition) for validation."""
    L, poly = CRC_POLYS[name]
    reg = 0
    for b in bits:
        fb = (reg >> (L - 1)) & 1 ^ int(b)
        reg = ((reg << 1) & ((1 << L) - 1))
        if fb:
            reg ^= poly
    return [(reg >> (L - 1 - i)) & 1 for i in range(L)]


@pytest.mark.parametrize("name", list(CRC_POLYS))
@pytest.mark.parametrize("A", [12, 100, 1013])
def test_crc_matches_bitwise(name, A):
    rng = np.random.default_rng(42 + A)
    bits = rng.integers(0, 2, size=A).astype(np.int8)
    got = np.asarray(crc_compute(jnp.asarray(bits), name))
    want = np.array(crc_bitwise(bits, name), dtype=np.int8)
    np.testing.assert_array_equal(got, want)


def test_crc_attach_check_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(5, 64)).astype(np.int8)
    cw = crc_attach(jnp.asarray(bits), "24A")
    assert bool(crc_ok(cw, "24A").all())
    corrupted = cw.at[:, 3].set(1 - cw[:, 3])
    assert not bool(crc_ok(corrupted, "24A").any())


def test_crc_batch_shapes():
    bits = jnp.zeros((2, 3, 40), jnp.int8)
    out = crc_compute(bits, "16")
    assert out.shape == (2, 3, 16)
