"""LTE turbo codec tests (TS 36.212 §5.1.3.2; reference 3gpplte_sse.c /
3gpplte_turbo_decoder_sse_16bit.c behavior)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from openairinterface5g_tpu.coding import turbo
from openairinterface5g_tpu.data.lte_tables import QPP_BY_K


def test_qpp_interleaver_is_permutation():
    for K in (40, 512, 6144):
        pi = turbo.qpp_interleaver(K)
        assert sorted(pi.tolist()) == list(range(K))


def test_encode_shapes_and_termination():
    K = 40
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (3, K)).astype(np.int8))
    d0, d1, d2 = turbo.encode(bits)
    assert d0.shape == d1.shape == d2.shape == (3, K + 4)
    np.testing.assert_array_equal(np.asarray(d0[:, :K]), np.asarray(bits))
    # termination drives encoder 1 back to state 0: re-run the trellis
    nxt, par, term_x = turbo._tables()
    for b in range(3):
        s = 0
        for k in range(K):
            s = nxt[s, int(bits[b, k])]
        # tail (X(K), X(K+1), X(K+2)) = (d0[K], d2[K], d1[K+1])
        xt = [int(d0[b, K]), int(d2[b, K]), int(d1[b, K + 1])]
        for x in xt:
            assert x == term_x[s]
            s = nxt[s, x]
        assert s == 0


@pytest.mark.parametrize("K", [40, 512])
def test_turbo_awgn_roundtrip(K):
    """Rate-1/3 turbo decodes cleanly at 2 dB Es/N0 (well above threshold)."""
    rng = np.random.default_rng(K)
    B = 8
    bits = jnp.asarray(rng.integers(0, 2, (B, K)).astype(np.int8))
    d0, d1, d2 = turbo.encode(bits)

    def llrs(d):
        x = 1.0 - 2.0 * np.asarray(d, np.float32)
        sigma2 = 10 ** (-2.0 / 10)
        n = rng.normal(0, np.sqrt(sigma2), x.shape).astype(np.float32)
        return jnp.asarray(2.0 * (x + n) / sigma2)

    dec, llr = turbo.decode(llrs(d0), llrs(d1), llrs(d2), n_iters=6)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))


def test_turbo_corrects_at_low_snr_vs_uncoded():
    """At -1 dB the turbo decoder must fix errors an uncoded slicer makes."""
    rng = np.random.default_rng(7)
    K = 1024
    bits = jnp.asarray(rng.integers(0, 2, (4, K)).astype(np.int8))
    d0, d1, d2 = turbo.encode(bits)
    sigma2 = 10 ** (1.0 / 10)

    def llrs(d):
        x = 1.0 - 2.0 * np.asarray(d, np.float32)
        n = rng.normal(0, np.sqrt(sigma2), x.shape).astype(np.float32)
        return jnp.asarray(2.0 * (x + n) / sigma2)

    l0 = llrs(d0)
    uncoded_err = int(np.sum((np.asarray(l0[:, :K]) < 0) != np.asarray(bits)))
    assert uncoded_err > 0, "test needs a noisy channel"
    dec, _ = turbo.decode(l0, llrs(d1), llrs(d2), n_iters=8)
    coded_err = int(np.sum(np.asarray(dec) != np.asarray(bits)))
    assert coded_err == 0
