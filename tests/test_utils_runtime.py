"""ITTI-style bus + telnet control server tests (§2.3 infra analogs)."""
from __future__ import annotations

import socket

from openairinterface5g_tpu.utils.itti import Itti
from openairinterface5g_tpu.utils.telnet import TelnetServer


def test_itti_send_and_broadcast():
    bus = Itti()
    seen = {"a": [], "b": []}

    bus.create_task("a", lambda b, m: seen["a"].append((m.msg_id, m.payload)))
    bus.create_task("b", lambda b, m: seen["b"].append((m.msg_id, m.payload)))
    bus.send("a", "CONFIG_REQ", {"x": 1})
    bus.broadcast("TICK", 7)
    assert bus.wait_idle()
    bus.terminate()
    assert ("CONFIG_REQ", {"x": 1}) in seen["a"]
    assert ("TICK", 7) in seen["a"] and ("TICK", 7) in seen["b"]


def test_itti_task_to_task():
    bus = Itti()
    out = []

    def fwd(b, m):
        b.send("sink", "FWD", m.payload + 1, origin="relay")

    bus.create_task("relay", fwd)
    bus.create_task("sink", lambda b, m: out.append((m.origin, m.payload)))
    bus.send("relay", "IN", 41)
    assert bus.wait_idle()
    bus.terminate()
    assert out == [("relay", 42)]


def _cmd(srv_addr, line: str) -> str:
    with socket.create_connection(srv_addr, timeout=5) as c:
        c.sendall((line + "\n").encode())
        return c.makefile().readline().strip()


def test_telnet_get_set_exec():
    srv = TelnetServer().start()
    srv.register_var("snr_db", 10.0)
    srv.register_var("channel", "AWGN")
    srv.register_cmd("sum", lambda *a: sum(map(int, a)))
    try:
        assert _cmd(srv.addr, "get snr_db") == "10.0"
        assert _cmd(srv.addr, "set snr_db 12.5") == "OK"
        assert srv.get("snr_db") == 12.5
        assert _cmd(srv.addr, "set channel TDLA30") == "OK"
        assert srv.get("channel") == "TDLA30"
        assert _cmd(srv.addr, "exec sum 1 2 3") == "6"
        assert "snr_db" in _cmd(srv.addr, "list")
        assert _cmd(srv.addr, "get nope").startswith("ERR")
    finally:
        srv.stop()
