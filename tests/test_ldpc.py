import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openairinterface5g_tpu.coding.ldpc import build_graph, check_parity_np, decode, encode
from openairinterface5g_tpu.coding.rate_matching import rate_match_rx, rate_match_tx
from openairinterface5g_tpu.data.tables import ALL_LIFTING_SIZES


@pytest.mark.parametrize("bg", [1, 2])
@pytest.mark.parametrize("Z", [2, 16, 52, 104, 208, 384])
def test_encode_satisfies_parity(bg, Z):
    g = build_graph(bg, Z)
    rng = np.random.default_rng(bg * 1000 + Z)
    info = rng.integers(0, 2, size=(3, g.K)).astype(np.int8)
    cw = np.asarray(encode(g, jnp.asarray(info)))
    assert cw.shape == (3, g.cols * Z)
    np.testing.assert_array_equal(cw[:, : g.K], info)  # systematic
    for b in range(3):
        assert check_parity_np(g, cw[b]), f"parity failed bg={bg} Z={Z} b={b}"


def test_all_lifting_sizes_build():
    for Z in ALL_LIFTING_SIZES:
        build_graph(1, Z)
        build_graph(2, Z)


@pytest.mark.parametrize("bg,Z", [(1, 96), (2, 128)])
def test_decode_noiseless(bg, Z):
    g = build_graph(bg, Z)
    rng = np.random.default_rng(7)
    info = rng.integers(0, 2, size=(4, g.K)).astype(np.int8)
    cw = np.asarray(encode(g, jnp.asarray(info))).astype(np.float32)
    # BPSK LLR, puncture first 2Z (LLR 0) as the rate matcher would
    llr = (1.0 - 2.0 * cw) * 8.0
    llr[:, : 2 * Z] = 0.0
    bits, ok, iters = decode(g, jnp.asarray(llr), n_iters=20)
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), info)
    assert int(iters) <= 6


@pytest.mark.parametrize("bg,Z,snr_db", [(1, 384, 4.0), (2, 384, 3.0)])
def test_decode_awgn_rate_third(bg, Z, snr_db):
    """Full mother-code rate (~1/3 BG1, ~1/5 BG2) should decode easily at
    moderate SNR: BLER must be 0 over a small batch."""
    g = build_graph(bg, Z)
    rng = np.random.default_rng(123)
    B = 8
    info = rng.integers(0, 2, size=(B, g.K)).astype(np.int8)
    cw = np.asarray(encode(g, jnp.asarray(info))).astype(np.float32)
    tx = 1.0 - 2.0 * cw
    sigma = 10 ** (-snr_db / 20)
    y = tx + sigma * rng.standard_normal(tx.shape).astype(np.float32)
    llr = 2.0 * y / sigma**2
    llr[:, : 2 * Z] = 0.0  # punctured
    bits, ok, _ = decode(g, jnp.asarray(llr), n_iters=25)
    np.testing.assert_array_equal(np.asarray(bits), info)
    assert bool(ok.all())


@pytest.mark.parametrize("rv", [0, 1, 2, 3])
def test_rate_match_roundtrip(rv):
    bg, Z = 1, 64
    g = build_graph(bg, Z)
    rng = np.random.default_rng(rv)
    F = 40
    info = rng.integers(0, 2, size=(2, g.K)).astype(np.int8)
    info[:, g.K - F:] = 0  # filler
    cw = encode(g, jnp.asarray(info))
    E = 3 * Z * 22  # rate ~1/3 worth of bits
    e = rate_match_tx(g, cw, rv, E, F)
    assert e.shape == (2, E)
    llr_e = (1.0 - 2.0 * np.asarray(e).astype(np.float32)) * 4.0
    llr_full = rate_match_rx(g, jnp.asarray(llr_e), rv, F)
    bits, ok, _ = decode(g, llr_full, n_iters=20)
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), info)


def test_harq_combining_improves():
    bg, Z = 1, 64
    g = build_graph(bg, Z)
    rng = np.random.default_rng(99)
    info = rng.integers(0, 2, size=(2, g.K)).astype(np.int8)
    cw = encode(g, jnp.asarray(info))
    E = int(1.2 * g.K)  # high rate: one round at low SNR should fail
    sigma = 1.0

    def round_llr(rv):
        e = np.asarray(rate_match_tx(g, cw, rv, E, 0)).astype(np.float32)
        y = (1 - 2 * e) + sigma * rng.standard_normal(e.shape).astype(np.float32)
        return jnp.asarray(2 * y / sigma**2)

    buf = rate_match_rx(g, round_llr(0), 0, 0)
    buf = rate_match_rx(g, round_llr(2), 2, 0, harq_buffer=buf)
    buf = rate_match_rx(g, round_llr(3), 3, 0, harq_buffer=buf)
    bits, ok, _ = decode(g, buf, n_iters=25)
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), info)


def test_lbrm_limited_buffer_roundtrip():
    """LBRM (TS 38.212 5.4.2.1): Ncb-limited circular buffer at rv 2/3."""
    from openairinterface5g_tpu.transport import ncb_lbrm
    g = build_graph(1, 384)
    rng = np.random.default_rng(77)
    info = rng.integers(0, 2, (2, g.K)).astype(np.int8)
    cw = encode(g, jnp.asarray(info))
    ncb = ncb_lbrm(g.N, 10, 106)
    assert ncb < g.N
    for rv, E in ((0, 2 * g.K), (2, 2 * g.K), (3, ncb)):
        e = rate_match_tx(g, cw, rv, E, 0, ncb=ncb)
        from openairinterface5g_tpu.coding.rate_matching import (
            fused_rate_match_rx, interleave_tx,
        )
        f = interleave_tx(e, 2)
        llr = (1.0 - 2.0 * np.asarray(f).astype(np.float32)) * 6
        full = fused_rate_match_rx(g, jnp.asarray(llr), rv, (E,), 2, 0, ncb=ncb)
        bits, ok, _ = decode(g, full.reshape(2, -1), n_iters=20)
        assert bool(ok.all()) and np.array_equal(np.asarray(bits), info), rv


def test_fused_rate_match_runs_equiv_gather():
    """Run-wise dense slice rate matching == per-CB index gather reference,
    TX and RX, across rv / filler / repetition / LBRM cases."""
    from openairinterface5g_tpu.coding.rate_matching import (
        deinterleave_rx, fused_rate_match_rx, fused_rate_match_tx,
        interleave_tx, rate_match_rx, rate_match_tx)
    from openairinterface5g_tpu.coding import ldpc as ldpc_mod
    rng = np.random.default_rng(3)
    for bg, Z, rv, F, qm, es, ncb in [
        (1, 64, 0, 0, 2, (1000, 1000), None),
        (1, 64, 2, 36, 4, (1408, 1412), None),
        (2, 52, 3, 10, 2, (600, 604, 604), None),
        (2, 16, 0, 0, 2, (2000,), None),            # repetition: E > N
        (1, 32, 2, 0, 6, (1200, 1200), 1408),       # LBRM-limited buffer
    ]:
        g = ldpc_mod.build_graph(bg, Z)
        C = len(es)
        B = 2
        cw = jnp.asarray(rng.integers(0, 2, (B, C, g.cols * Z)).astype(np.int8))
        # TX equivalence
        ref_parts = []
        for j, E in enumerate(es):
            e = rate_match_tx(g, cw[:, j], rv, E, F, ncb=ncb)
            ref_parts.append(interleave_tx(e, qm))
        ref_tx = jnp.concatenate(ref_parts, axis=-1)
        got_tx = fused_rate_match_tx(g, cw, rv, tuple(es), qm, F, ncb=ncb)
        assert np.array_equal(np.asarray(ref_tx), np.asarray(got_tx)), \
            f"TX mismatch bg={bg} Z={Z} rv={rv}"
        # RX equivalence
        llr = jnp.asarray(rng.normal(size=(B, sum(es))).astype(np.float32))
        offs = np.concatenate([[0], np.cumsum(es)])
        ref_rx = jnp.stack([
            rate_match_rx(g, deinterleave_rx(
                llr[:, int(offs[j]): int(offs[j + 1])], qm), rv, F)
            for j in range(C)], axis=1)
        got_rx = fused_rate_match_rx(g, llr, rv, tuple(es), qm, F, ncb=ncb)
        # rate_match_rx has no ncb plumbing in this old path; recompute
        # reference manually when LBRM (selection_indices handles ncb)
        if ncb is None:
            np.testing.assert_allclose(np.asarray(ref_rx), np.asarray(got_rx),
                                       rtol=1e-6)
        else:
            # TX->RX self-consistency: scatter back the TX bits' signs
            sgn = 1.0 - 2.0 * np.asarray(got_tx, np.float32)
            back = fused_rate_match_rx(g, jnp.asarray(sgn), rv, tuple(es),
                                       qm, F, ncb=ncb)
            cwf = np.asarray(cw, np.float32)
            back_np = np.asarray(back)
            sel_mask = np.abs(back_np) > 0.5
            sel_mask[..., :2 * Z] = False
            K = g.K
            sel_mask[..., K - F: K] = False
            signs = 1.0 - 2.0 * cwf
            # every selected position's combined sign agrees with the bit
            agree = np.sign(back_np[sel_mask]) == np.sign(signs[sel_mask])
            assert agree.all()
