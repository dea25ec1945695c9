import numpy as np
import jax.numpy as jnp

from openairinterface5g_tpu.models.pdcch import DciConfig, pdcch_tx_grid
from openairinterface5g_tpu.models.pdsch import PdschConfig
from openairinterface5g_tpu.models.pusch import pusch_tx_grid
from openairinterface5g_tpu.models.ue import (
    DCI_A, UeConfig, decode_grant, encode_grant, ue_receive_slot,
)


def test_grant_pack_roundtrip():
    bits = encode_grant(mcs=17, prb_start=12, n_prb=24, rv=2, ndi=1, harq_id=5)
    assert len(bits) == DCI_A
    g = decode_grant(bits)
    assert (g["mcs"], g["prb_start"], g["n_prb"], g["rv"], g["harq_id"]) == (17, 12, 24, 2, 5)


def test_ue_control_plus_data_slot():
    """gNB builds a slot with PDCCH grant + PDSCH; UE blind-decodes the DCI
    and uses it to decode the data — the full control+data round trip."""
    bwp = 48
    ue = UeConfig(mu=1, n_bwp_prb=bwp, rnti=0x4444, coreset_prb=bwp)
    grant = dict(mcs=9, prb_start=12, n_prb=24, rv=0)
    pdsch = PdschConfig(mu=1, n_prb=24, prb_start=12, n_bwp_prb=bwp, mcs=9,
                        rnti=ue.rnti, start_symbol=2, n_symbols=12,
                        dmrs_symbols=(2,))
    rng = np.random.default_rng(0)
    B = 2
    tb = jnp.asarray(rng.integers(0, 2, (B, pdsch.tbs)).astype(np.int8))

    # gNB: compose PDCCH (symbol 0) + PDSCH (symbols 2..13) on the BWP grid
    grid, _ = pusch_tx_grid(pdsch, tb)
    dci_cfg = DciConfig(A=DCI_A, aggregation_level=4, rnti=ue.rnti,
                        coreset_prb=bwp)
    dci_payload = jnp.asarray(np.tile(encode_grant(**grant), (B, 1)))
    coreset = pdcch_tx_grid(dci_cfg, dci_payload)
    grid = grid.at[:, 0, 0, :].add(coreset)

    # channel: phase + AWGN
    noise = 0.05 * (rng.standard_normal((B, 1) + grid.shape[2:])
                    + 1j * rng.standard_normal((B, 1) + grid.shape[2:]))
    rx_grid = grid[:, 0][:, None] * np.exp(1j * 0.2) + jnp.asarray(noise.astype(np.complex64))

    out = ue_receive_slot(ue, rx_grid, n_iters=10)
    assert bool(out["dci_found"].all())
    assert out["grant"]["mcs"] == 9 and out["grant"]["n_prb"] == 24
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)
