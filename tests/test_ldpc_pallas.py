import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from openairinterface5g_tpu.coding.ldpc import build_graph, decode, encode
from openairinterface5g_tpu.ops.ldpc_pallas import decode_pallas


@pytest.mark.parametrize("schedule", ["layered", "flooding"])
def test_pallas_decoder_interp(schedule):
    g = build_graph(2, 64)
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (4, g.K)).astype(np.int8)
    cw = np.asarray(encode(g, jnp.asarray(info))).astype(np.float32)
    sigma = 10 ** (-3.0 / 20)
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape).astype(np.float32)
    llr = 2 * y / sigma**2
    llr[:, : 2 * g.Z] = 0
    with pltpu.force_tpu_interpret_mode():
        bits, ok = decode_pallas(g, jnp.asarray(llr), n_iters=8, schedule=schedule)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(bits), info)


def test_pallas_matches_xla_hard_decisions():
    """Flooding pallas kernel and the XLA reference decoder agree on
    noiseless input after the same number of iterations."""
    g = build_graph(2, 32)
    rng = np.random.default_rng(1)
    info = rng.integers(0, 2, (2, g.K)).astype(np.int8)
    cw = np.asarray(encode(g, jnp.asarray(info))).astype(np.float32)
    llr = (1 - 2 * cw) * 4.0
    llr[:, : 2 * g.Z] = 0
    with pltpu.force_tpu_interpret_mode():
        bits_p, ok_p = decode_pallas(g, jnp.asarray(llr), n_iters=5,
                                     schedule="flooding")
    bits_x, ok_x, _ = decode(g, jnp.asarray(llr), n_iters=5, early_stop=False)
    np.testing.assert_array_equal(np.asarray(bits_p), np.asarray(bits_x)[:, : g.K])
    assert bool(ok_p.all()) and bool(ok_x.all())


def test_pallas_batch_padding():
    g = build_graph(2, 32)
    rng = np.random.default_rng(2)
    info = rng.integers(0, 2, (3, g.K)).astype(np.int8)  # not a multiple of 8
    cw = np.asarray(encode(g, jnp.asarray(info))).astype(np.float32)
    llr = (1 - 2 * cw) * 4.0
    llr[:, : 2 * g.Z] = 0
    with pltpu.force_tpu_interpret_mode():
        bits, ok = decode_pallas(g, jnp.asarray(llr), n_iters=6)
    assert bits.shape == (3, g.K)
    assert bool(np.asarray(ok).all())


@pytest.mark.parametrize("schedule", ["layered", "flooding"])
def test_pallas_int8_path(schedule):
    """Fixed-point int8-message / int16-total kernel (reference 8-bit design)."""
    g = build_graph(2, 64)
    rng = np.random.default_rng(5)
    info = rng.integers(0, 2, (4, g.K)).astype(np.int8)
    cw = np.asarray(encode(g, jnp.asarray(info))).astype(np.float32)
    sigma = 10 ** (-3.0 / 20)
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape).astype(np.float32)
    llr = 2 * y / sigma**2
    llr[:, : 2 * g.Z] = 0
    with pltpu.force_tpu_interpret_mode():
        bits, ok = decode_pallas(g, jnp.asarray(llr), n_iters=8,
                                 schedule=schedule, msg_dtype=jnp.int8, sb=8)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(bits), info)


def test_pallas_early_termination_while_loop():
    """In-kernel parity early exit (check_every>0): dynamic-trip while
    loop decodes identically to the fixed-iteration kernel (the
    decode_abort_t / early-stop analog of nrLDPC_decoder.c:554)."""
    g = build_graph(2, 64)
    rng = np.random.default_rng(2)
    info = rng.integers(0, 2, (8, g.K)).astype(np.int8)
    cw = np.asarray(encode(g, jnp.asarray(info))).astype(np.float32)
    sigma = 10 ** (-3.0 / 20)
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape).astype(np.float32)
    llr = np.clip(2 * y / sigma**2, -24, 24)
    llr[:, : 2 * g.Z] = 0
    with pltpu.force_tpu_interpret_mode():
        bits, ok = decode_pallas(g, jnp.asarray(llr), n_iters=8, check_every=2)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(bits), info)


def test_two_phase_early_stop_backend():
    """backend first_iters: short pass + lax.cond full pass decodes the
    same TBs as a straight full-iteration decode."""
    from openairinterface5g_tpu.coding.backend import decoder

    g = build_graph(2, 64)
    rng = np.random.default_rng(3)
    info = rng.integers(0, 2, (8, g.K)).astype(np.int8)
    cw = np.asarray(encode(g, jnp.asarray(info))).astype(np.float32)
    # mid-SNR: the 2-iter first phase is NOT enough, forcing the cond's
    # full-decode branch; then a clean case that takes the early branch
    sigma = 10 ** (-1.5 / 20)
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape).astype(np.float32)
    llr = np.clip(2 * y / sigma**2, -24, 24)
    llr[:, : 2 * g.Z] = 0
    with pltpu.force_tpu_interpret_mode():
        bits_a, ok_a = decoder("pallas")(g, jnp.asarray(llr), n_iters=10,
                                         first_iters=2)
        bits_b, ok_b = decoder("pallas")(g, jnp.asarray(llr), n_iters=10)
    np.testing.assert_array_equal(np.asarray(ok_a), np.asarray(ok_b))
    np.testing.assert_array_equal(np.asarray(bits_a), np.asarray(bits_b))
