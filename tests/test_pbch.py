import numpy as np
import jax
import jax.numpy as jnp

from openairinterface5g_tpu.models.pbch import (
    PbchConfig, pbch_decode, pbch_encode, ssb_generate, ssb_receive,
)


def test_pbch_encode_decode_noiseless():
    cfg = PbchConfig(n_id=41, i_ssb=2)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, (3, 32)).astype(np.int8)
    e = pbch_encode(cfg, jnp.asarray(payload))
    assert e.shape == (3, 864)
    llr = (1.0 - 2.0 * np.asarray(e).astype(np.float32)) * 8
    bits, ok = pbch_decode(cfg, jnp.asarray(llr))
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), payload)


def test_ssb_tile_structure():
    cfg = PbchConfig(n_id=7, i_ssb=1)
    payload = jnp.zeros((1, 32), jnp.int8)
    tile = ssb_generate(cfg, payload)
    assert tile.shape == (1, 4, 240)
    t = np.asarray(tile[0])
    # PSS present on symbol 0 center 127 SCs, zero elsewhere on symbol 0
    assert np.abs(t[0, 56:183]).min() > 0
    assert np.abs(t[0, :56]).max() == 0
    # symbols 1 and 3 fully occupied (PBCH+DMRS)
    assert np.abs(t[1]).min() > 0
    assert np.abs(t[3]).min() > 0


def test_ssb_end_to_end_awgn():
    cfg = PbchConfig(n_id=123, i_ssb=0)
    rng = np.random.default_rng(5)
    B = 4
    payload = rng.integers(0, 2, (B, 32)).astype(np.int8)
    tile = ssb_generate(cfg, jnp.asarray(payload))
    # 1 rx antenna, flat channel with phase + AWGN at ~ -4 dB SNR
    h = np.exp(1j * 0.7).astype(np.complex64)
    sigma = 10 ** (4.0 / 20)  # -4 dB SNR on unit-energy REs
    noise = (rng.standard_normal(tile.shape) + 1j * rng.standard_normal(tile.shape)) / np.sqrt(2)
    rx = (h * np.asarray(tile) + sigma * noise.astype(np.complex64))[:, None]
    bits, ok = ssb_receive(cfg, jnp.asarray(rx))
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), payload)


def test_ssb_wrong_cell_id_fails_crc():
    cfg = PbchConfig(n_id=123, i_ssb=0)
    payload = jnp.zeros((2, 32), jnp.int8)
    tile = ssb_generate(cfg, payload)
    wrong = PbchConfig(n_id=124, i_ssb=0)
    bits, ok = ssb_receive(wrong, tile[:, None])
    assert not bool(ok.any())


def test_mib_pack_unpack_roundtrip():
    from openairinterface5g_tpu.models.pbch import Mib, mib_payload, mib_unpack
    mib = Mib(scs_common=1, k_ssb=22, dmrs_typea_pos=1,
              pdcch_config_sib1=0xA5, cell_barred=0, intra_freq_reselection=1)
    a = mib_payload(mib, sfn=517, hrf=1, ssb_idx=3, lmax=8)
    out = mib_unpack(a[None], lmax=8)
    assert int(out["sfn"][0]) == 517
    assert int(out["hrf"][0]) == 1
    assert int(out["k_ssb"][0]) == 22
    assert int(out["pdcch_config_sib1"][0]) == 0xA5
    assert int(out["dmrs_typea_pos"][0]) == 1
    assert int(out["intra_freq_reselection"][0]) == 1
    # Lmax=64 carries SSB index MSBs instead of the k_SSB MSB
    a64 = mib_payload(mib, sfn=900, hrf=0, ssb_idx=45, lmax=64)
    out64 = mib_unpack(a64[None], lmax=64)
    assert int(out64["ssb_idx_msbs"][0]) == (45 >> 3) * 8
    assert int(out64["sfn"][0]) == 900


def test_pbch_first_level_scrambling_differs_by_sfn():
    """Same MIB content at two SFNs (different v) -> different coded bits,
    both decode to their own payloads."""
    from openairinterface5g_tpu.models.pbch import Mib, mib_payload, mib_unpack
    cfg = PbchConfig(n_id=77, i_ssb=1)
    mib = Mib(pdcch_config_sib1=17)
    a1 = mib_payload(mib, sfn=100, hrf=0)   # v = (100>>1)&1, (100>>2)&1
    a2 = mib_payload(mib, sfn=102, hrf=0)
    e1 = pbch_encode(cfg, jnp.asarray(a1[None]))
    e2 = pbch_encode(cfg, jnp.asarray(a2[None]))
    assert np.asarray(e1 ^ e2).sum() > 200   # scrambling decorrelates
    for a, e, sfn in ((a1, e1, 100), (a2, e2, 102)):
        llr = (1.0 - 2.0 * np.asarray(e).astype(np.float32)) * 8
        bits, ok = pbch_decode(cfg, jnp.asarray(llr))
        assert bool(ok.all())
        np.testing.assert_array_equal(np.asarray(bits)[0], a)
        assert int(mib_unpack(bits, lmax=8)["sfn"][0]) == sfn


def test_pbch_lmax_64_second_level_shift():
    """i_ssb 3 LSBs select the 2nd-level sequence at Lmax=64; batch mixes
    payloads and still decodes."""
    cfg = PbchConfig(n_id=200, i_ssb=13, lmax=64)
    rng = np.random.default_rng(8)
    payload = rng.integers(0, 2, (2, 32)).astype(np.int8)
    e = pbch_encode(cfg, jnp.asarray(payload))
    llr = (1.0 - 2.0 * np.asarray(e).astype(np.float32)) * 8
    bits, ok = pbch_decode(cfg, jnp.asarray(llr))
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(bits), payload)
    # wrong i_ssb LSBs -> descramble fails CRC
    wrong = PbchConfig(n_id=200, i_ssb=14, lmax=64)
    _, ok_w = pbch_decode(wrong, jnp.asarray(llr))
    assert not bool(ok_w.any())


def test_ssb_burst_patterns():
    from openairinterface5g_tpu.models.pbch import ssb_first_symbols, ssb_in_slot
    # counts per 38.213 §4.1
    assert len(ssb_first_symbols("A", 4)) == 4
    assert len(ssb_first_symbols("A", 8)) == 8
    assert len(ssb_first_symbols("B", 8)) == 8
    assert len(ssb_first_symbols("C", 8)) == 8
    assert len(ssb_first_symbols("D", 64)) == 64
    assert len(ssb_first_symbols("E", 64)) == 64
    np.testing.assert_array_equal(ssb_first_symbols("C", 4), [2, 8, 16, 22])
    np.testing.assert_array_equal(ssb_first_symbols("B", 4), [4, 8, 16, 20])
    # slot mapping: case C slot 0 carries SSB 0 (sym 2) and SSB 1 (sym 8)
    assert ssb_in_slot("C", 8, 0) == [(0, 2), (1, 8)]
    assert ssb_in_slot("C", 8, 1) == [(2, 2), (3, 8)]
    # SSBs never straddle a slot boundary (except case E/240 kHz, where
    # the SSB-only numerology legitimately crosses 14-symbol boundaries)
    for case, lmax in (("A", 8), ("B", 8), ("C", 8), ("D", 64)):
        firsts = ssb_first_symbols(case, lmax)
        assert ((firsts % 14) + 4 <= 14).all()


def test_multi_ssb_slot_and_burst_rx():
    """Two SSB beams in one slot (case C), each decodes with its own
    DMRS/scrambling identity."""
    from openairinterface5g_tpu.models.gnb import SlotDlConfig, SsbPdu, gnb_dl_slot
    from openairinterface5g_tpu.models.pbch import (Mib, mib_payload,
                                                    mib_unpack, ssb_in_slot,
                                                    ssb_receive)
    from openairinterface5g_tpu.config import make_frame_params
    from openairinterface5g_tpu.phy.ofdm import extract_from_grid, ofdm_demodulate

    n_id, lmax = 99, 8
    mib = Mib(pdcch_config_sib1=3)
    placement = ssb_in_slot("C", lmax, 0)
    pdus = tuple(SsbPdu(PbchConfig(n_id=n_id, i_ssb=i, lmax=lmax),
                        prb_offset=2, start_symbol=s0)
                 for i, s0 in placement)
    mibs = [jnp.asarray(mib_payload(mib, sfn=64, hrf=0, ssb_idx=i,
                                    lmax=lmax)[None])
            for i, _ in placement]
    dl = SlotDlConfig(mu=1, n_bwp_prb=24, ssb=pdus, slot=0)
    tx, _ = gnb_dl_slot(dl, [], mib_payload=mibs)
    fp = make_frame_params(1, 24)
    grid = extract_from_grid(fp, ofdm_demodulate(fp, tx, 0))
    for (i, s0), mpl in zip(placement, mibs):
        tile = grid[:, :, s0: s0 + 4, 24: 24 + 240]
        bits, ok = ssb_receive(PbchConfig(n_id=n_id, i_ssb=i, lmax=lmax), tile)
        assert bool(ok.all()), f"SSB {i} failed"
        np.testing.assert_array_equal(np.asarray(bits), np.asarray(mpl))
        assert int(mib_unpack(bits, lmax=lmax)["sfn"][0]) == 64
