"""Persistent compile cache: per-host partitioning.

XLA:CPU cache entries embed AOT machine code for the compiling host's ISA;
sharing one dir across heterogeneous machines replays mismatched AOT results
(cpu_aot_loader warnings / SIGILL). `enable()` must therefore mix a stable
host fingerprint into the cache path.
"""

import os

import jax

from radvlm_tpu.utils import compile_cache


def test_fingerprint_stable_and_short():
    a = compile_cache._host_fingerprint()
    b = compile_cache._host_fingerprint()
    assert a == b
    assert len(a) == 12
    int(a, 16)  # hex


def test_enable_partitions_by_host(tmp_path, monkeypatch):
    monkeypatch.delenv("RADVLM_COMPILE_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        out = compile_cache.enable(str(tmp_path))
        assert out == os.path.join(
            str(tmp_path), compile_cache._host_fingerprint()
        )
        assert os.path.isdir(out)
        assert jax.config.jax_compilation_cache_dir == out
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_opt_out(monkeypatch):
    monkeypatch.setenv("RADVLM_COMPILE_CACHE", "0")
    assert compile_cache.enable() is None
