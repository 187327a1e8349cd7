"""Backend selection guard for the tunneled-TPU environment.

The deployment image force-registers the `axon` TPU PJRT plugin from a
sitecustomize at interpreter start, and that backend retries its relay
connection forever — with the tunnel down, the first `jax.devices()` (or any
trace) blocks indefinitely, and exporting ``JAX_PLATFORMS=cpu`` alone does
NOT rescue a process because the registration already happened.  Every
entrypoint that must never hang (benchmarks the driver times, CLIs) calls
:func:`ensure_backend` before touching jax: it probes the relay socket
instead of the backend (a 3 s bounded check) and, when the tunnel is dead,
forces the CPU backend through ``jax.config`` — the one knob that still wins
post-registration.
"""

from __future__ import annotations

import os

_RELAY_ADDR = ("127.0.0.1", 8082)  # tunnel relay listens on 8082+ when up


def tunnel_reachable(timeout: float = 3.0) -> bool:
    """Bounded probe of the TPU tunnel relay socket (never touches jax)."""
    import socket

    try:
        socket.create_connection(_RELAY_ADDR, timeout=timeout).close()
        return True
    except OSError:
        return False


def ensure_backend() -> bool:
    """Pin a usable jax backend; returns False iff we fell back to CPU.

    Must run before jax initializes its backends (importing jax is fine;
    creating arrays is not).  Behavior:

    - ``JAX_PLATFORMS`` unset or a local backend (cpu/...): force it through
      ``jax.config`` (default cpu) so the sitecustomize-registered axon
      plugin cannot be auto-picked, and return True — local backends
      initialize (or fail) fast.
    - ``JAX_PLATFORMS=axon``: probe the relay.  Up -> leave the env choice
      alone, return True.  Down -> force cpu, return False; the caller
      decides how to degrade (tiny model, fallback flag in its output).
    """
    import jax

    env = os.environ.get("JAX_PLATFORMS", "")
    if env != "axon":
        jax.config.update("jax_platforms", env or "cpu")
        return True
    if tunnel_reachable():
        return True
    jax.config.update("jax_platforms", "cpu")
    return False
