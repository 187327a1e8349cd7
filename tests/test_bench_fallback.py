"""bench.py resilience: the round bench must always record a number — HBM
OOM retries at fewer slots. (Fused-W8A8 compile failures are handled inside
the engine: ContinuousBatcher.warmup() falls back to the XLA emitter,
tests/test_continuous.py::test_warmup_falls_back_when_fused_w8a8_cannot_compile.)
"""

import jax
import pytest


def _err(msg):
    # jax.errors.JaxRuntimeError wraps XLA/Mosaic compile failures
    return jax.errors.JaxRuntimeError(msg)


@pytest.fixture()
def bench():
    import bench as bench_mod

    return bench_mod


def test_oom_retries_at_fewer_slots(bench, monkeypatch):
    calls = []

    def fake_run(cfg, params, gen, size, slots):
        calls.append(slots)
        if len(calls) == 1:
            raise _err("RESOURCE_EXHAUSTED: out of memory on device")

    monkeypatch.setattr(bench, "_run_continuous", fake_run)
    bench.run_continuous(None, None, None, "7b-int8")
    assert calls == [24, 12]


def test_other_errors_propagate(bench, monkeypatch):
    def fake_run(cfg, params, gen, size, slots):
        raise _err("INVALID_ARGUMENT: something else")

    monkeypatch.setattr(bench, "_run_continuous", fake_run)
    with pytest.raises(jax.errors.JaxRuntimeError, match="INVALID_ARGUMENT"):
        bench.run_continuous(None, None, None, "7b-int8")
