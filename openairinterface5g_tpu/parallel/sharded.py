"""Sharded slot processing: shard_map pipelines over the device mesh.

Maps the reference's process-level parallelism onto mesh axes:
  - C2 (per-CB decode jobs)  -> code blocks sharded over the `cb` axis,
    decoded independently, CRC flags all-gathered over ICI.
  - C4/C6 (symbol jobs, slot pipeline) -> slots sharded over `dp`.
  - C7 (RU/L1 fronthaul split) -> subcarrier-block sharding (planned:
    overlap-save FFT halo; the CP makes symbol boundaries clean).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..coding import ldpc


def sharded_ldpc_decode(mesh: Mesh, graph: ldpc.LDPCGraph, llrs: jnp.ndarray,
                        n_iters: int = 12, axis: str = "dp"):
    """Decode (n_cb, N) LLRs with the CB dim sharded over `axis`.

    Each device decodes its shard with the flooding min-sum kernel (no
    cross-device traffic during iterations); the ok-flags are
    all-gathered so every device (and the host) sees the TB-level
    verdict — the nr_postDecode aggregation analog.
    """
    spec = P(axis, None)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=(spec, P(axis)),
        check_vma=False)
    def _decode(llr_block):
        bits, ok, _ = ldpc.decode(graph, llr_block, n_iters=n_iters,
                                  early_stop=False)
        return bits, ok

    bits, ok = jax.jit(_decode)(llrs)
    return bits, ok


def sharded_slot_sweep(mesh: Mesh, cfg, snr_db: float, tb_bits, key,
                       n_iters: int = 12, axis: str = "dp"):
    """Run the full PUSCH TX->AWGN->RX chain with trials sharded over the
    mesh; returns per-trial CRC flags plus the psum'd success count (the
    cross-chip BLER reduction rides ICI).
    """
    from ..models.pusch import pusch_rx, pusch_tx
    from ..sim.channel import add_noise

    spec_tb = P(axis, None)
    spec_key = P(axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_tb, spec_key),
        out_specs=(P(axis), P()),
        check_vma=False)
    def _run(tb, keys):
        tx, _ = pusch_tx(cfg, tb)
        sig = jnp.mean(jnp.sum(jnp.abs(tx) ** 2, axis=-2)) / cfg.n_layers
        sigma2 = sig * (cfg.fp.fft_size / cfg.fp.n_sc) * 10 ** (-snr_db / 10)
        rx = add_noise(keys[0], tx, sigma2)
        out = pusch_rx(cfg, rx, n_iters=n_iters)
        ok = out["tb_ok"]
        total = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), axis)
        return ok, total

    keys = jax.random.split(key, mesh.devices.size)
    return jax.jit(_run)(tb_bits, keys)
