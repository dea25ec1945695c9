"""UE softmodem bring-up loop smoke test (nr-uesoftmodem analog §3.5)."""


def test_ue_softmodem_sync_and_data(capsys):
    from openairinterface5g_tpu.runtime.ue_softmodem import main
    rc = main(["-n", "2", "-R", "48", "-s", "20"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "pbch_crc_ok=True" in out
    assert "UE softmodem OK" in out
