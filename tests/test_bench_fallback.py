"""bench.py resilience: the round bench must always record a number —
fused-W8A8 compile failures fall back to the XLA emitter, HBM OOM retries
at fewer slots."""

import jax
import pytest


def _err(msg):
    # jax.errors.JaxRuntimeError wraps XLA/Mosaic compile failures
    return jax.errors.JaxRuntimeError(msg)


@pytest.fixture()
def bench(monkeypatch):
    import bench as bench_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("RADVLM_W8A8_IMPL", raising=False)
    return bench_mod


def test_fused_vmem_failure_falls_back_to_xla(bench, monkeypatch):
    calls = []

    def fake_run(cfg, params, gen, size, slots):
        calls.append((slots, bench.os.environ.get("RADVLM_W8A8_IMPL")))
        if len(calls) == 1:
            raise _err(
                "Ran out of memory in memory space vmem while allocating"
            )

    monkeypatch.setattr(bench, "_run_continuous", fake_run)
    bench.run_continuous(None, None, None, "7b-int8")
    assert calls[0][1] is None  # first attempt: default (fused)
    assert calls[1] == (24, "xla")  # retry: same slots, XLA emitter


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
