"""Persistent XLA compilation cache (cold-start killer for serving/bench).

A 7B serving stack pays minutes of XLA compiles at startup (every prompt-bucket
fill graph + two decode-chunk variants). JAX's persistent compilation cache
keyed on (HLO, flags, backend) makes warm restarts load compiled executables
from disk instead — the serving analog of the reference relying on eager torch
(no compile step) for instant worker startup.

Call `enable()` before the first jit dispatch. Opt out with
RADVLM_COMPILE_CACHE=0; override the location with RADVLM_COMPILE_CACHE=<dir>.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/radvlm_tpu/xla")


def _host_fingerprint() -> str:
    """Stable per-machine tag mixed into the cache path.

    XLA:CPU entries embed AOT machine code specialized to the *compiling*
    host's ISA features; JAX's cache key does not include them, so a cache
    dir shared across heterogeneous hosts (this repo's cache travels with
    the home dir between driver machines) replays mismatched AOT results —
    cpu_aot_loader then warns about every entry and can SIGILL. Hash the
    cpuinfo flag set so each distinct ISA gets its own subtree; TPU entries
    are unaffected (device kind is already in the key) but isolating them
    per-host is harmless.
    """
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compile cache. Returns the dir (None if disabled)."""
    env = os.environ.get("RADVLM_COMPILE_CACHE", "")
    if env == "0":
        return None
    if cache_dir is None:
        cache_dir = env if env not in ("", "1") else _DEFAULT_DIR
    cache_dir = os.path.join(cache_dir, _host_fingerprint())
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Default thresholds skip small/fast compiles; a serving stack wants every
    # graph cached — the long tail of bucket fills adds up to minutes.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
