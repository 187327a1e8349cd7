"""Dead-tunnel backend guard (utils/backend.py).

The axon PJRT plugin is force-registered by a sitecustomize and retries its
relay forever — entrypoints must probe the relay socket (bounded) and pin a
local backend through jax.config, or a dead tunnel hangs them indefinitely.
"""

import socket

import jax

from radvlm_tpu.utils import backend


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_tunnel_reachable_true(monkeypatch):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    monkeypatch.setattr(backend, "_RELAY_ADDR", srv.getsockname())
    try:
        assert backend.tunnel_reachable(timeout=1.0)
    finally:
        srv.close()


def test_tunnel_reachable_false(monkeypatch):
    monkeypatch.setattr(backend, "_RELAY_ADDR", ("127.0.0.1", _free_port()))
    assert not backend.tunnel_reachable(timeout=0.5)


def test_ensure_backend_local(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert backend.ensure_backend()
    assert jax.config.jax_platforms == "cpu"


def test_ensure_backend_axon_dead_falls_back(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(backend, "_RELAY_ADDR", ("127.0.0.1", _free_port()))
    assert not backend.ensure_backend()
    assert jax.config.jax_platforms == "cpu"


def test_ensure_backend_axon_up_keeps_axon(monkeypatch):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(backend, "_RELAY_ADDR", srv.getsockname())
    prev = jax.config.jax_platforms
    try:
        assert backend.ensure_backend()
        # does NOT touch the config when the tunnel answers
        assert jax.config.jax_platforms == prev
    finally:
        srv.close()
        jax.config.update("jax_platforms", prev)
