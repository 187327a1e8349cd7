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
    assert calls == [32, 16]


def test_other_errors_propagate(bench, monkeypatch):
    def fake_run(cfg, params, gen, size, slots):
        raise _err("INVALID_ARGUMENT: something else")

    monkeypatch.setattr(bench, "_run_continuous", fake_run)
    with pytest.raises(jax.errors.JaxRuntimeError, match="INVALID_ARGUMENT"):
        bench.run_continuous(None, None, None, "7b-int8")


@pytest.mark.parametrize("fleet", ["0", "2"])
def test_bench_continuous_executes_end_to_end(bench, monkeypatch, capsys,
                                              fleet):
    """The REAL _run_continuous flow (warmup -> unloaded p50 -> feeder ->
    timed run -> JSON line) at tiny geometry — both the single-engine and the
    RADVLM_BENCH_FLEET path (a fleet submit-signature break once shipped
    unexecuted)."""
    import json

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.generation.engine import GenerationConfig
    from radvlm_tpu.models import radvlm

    monkeypatch.setenv("RADVLM_BENCH_BUCKETS", "256")
    monkeypatch.setenv("RADVLM_BENCH_SLOTS", "2")
    monkeypatch.setenv("RADVLM_BENCH_REQS", "4")
    monkeypatch.setenv("RADVLM_BENCH_FLEET", fleet)
    monkeypatch.setenv("RADVLM_KV_INT8", "0")
    monkeypatch.setattr(bench, "NEW_TOKENS", 4)
    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    gen = GenerationConfig(max_new_tokens=4, eos_token_ids=())
    bench.run_continuous(cfg, params, gen, "tiny")
    line = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
    ][-1]
    out = json.loads(line)
    assert out["metric"] == "cxr_report_images_per_sec_per_chip"
    assert out["value"] > 0
    assert out["fleet"] == (2 if fleet == "2" else 1)
    assert out["requests"] == 4
    # Kernel-path provenance: every recorded bench line must say which
    # implementations actually ran (the r03 regression hid behind a kernel
    # default that was never visible in the JSON).
    assert out["w8a8_impl"] == "off"  # tiny init params are unquantized
    assert out["decode_kernel"] == "xla"  # CPU backend: no Pallas decode
    assert out["native_anyres"] in (True, False)
    assert out["compile_cache_hit"] in (True, False, None)
