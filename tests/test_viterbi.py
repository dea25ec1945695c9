"""LTE tail-biting convolutional code tests (ccoding_byte_lte.c /
viterbi_lte.c analog)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from openairinterface5g_tpu.coding import viterbi


def test_encode_tail_biting_property():
    """Encoder ends in the state it started from (tail-biting)."""
    nxt, _ = viterbi._tables()
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (1, 40)).astype(np.int8)
    L = bits.shape[1]
    init = 0
    for i in range(6):
        init |= int(bits[0, L - 1 - i]) << (5 - i)
    s = init
    for k in range(L):
        s = nxt[s, int(bits[0, k])]
    assert s == init


@pytest.mark.parametrize("L", [40, 120])
def test_viterbi_noiseless_roundtrip(L):
    rng = np.random.default_rng(L)
    bits = jnp.asarray(rng.integers(0, 2, (4, L)).astype(np.int8))
    coded = viterbi.encode(bits)
    llr = jnp.asarray(1.0 - 2.0 * np.asarray(coded, np.float32))
    dec = viterbi.decode(llr)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))


def test_viterbi_awgn():
    """Rate-1/3 K=7 corrects at 2 dB Es/N0 (DCI/PBCH operating region)."""
    rng = np.random.default_rng(3)
    L = 64
    bits = jnp.asarray(rng.integers(0, 2, (16, L)).astype(np.int8))
    coded = viterbi.encode(bits)
    x = 1.0 - 2.0 * np.asarray(coded, np.float32)
    sigma2 = 10 ** (-2.0 / 10)
    n = rng.normal(0, np.sqrt(sigma2), x.shape).astype(np.float32)
    llr = jnp.asarray(2.0 * (x + n) / sigma2)
    dec = viterbi.decode(llr)
    nerr = int(np.sum(np.asarray(dec) != np.asarray(bits)))
    assert nerr == 0
