"""tools/bench_train.py: the training-throughput bench must execute its real
flow (synthetic anyres batch -> jitted step -> timed loop -> one JSON line)
at tiny geometry, in both the full-SFT and the QLoRA mode."""

import importlib.util
import json
import os

import pytest


@pytest.fixture()
def bench_train():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "bench_train.py")
    spec = importlib.util.spec_from_file_location("bench_train", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(bench_train, monkeypatch, capsys, size):
    monkeypatch.setenv("RADVLM_TRAIN_BENCH_SIZE", size)
    monkeypatch.setenv("RADVLM_TRAIN_BENCH_SEQ", "256")
    monkeypatch.setenv("RADVLM_TRAIN_BENCH_BATCH", "8")
    monkeypatch.setenv("RADVLM_TRAIN_BENCH_STEPS", "2")
    monkeypatch.setenv("RADVLM_TRAIN_BENCH_MESH", "data=2,fsdp=4")
    monkeypatch.setenv("RADVLM_TRAIN_BENCH_IMG_PX", "32")
    bench_train.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


@pytest.mark.slow
def test_bench_train_tiny_sft(bench_train, monkeypatch, capsys):
    rec = _run(bench_train, monkeypatch, capsys, "tiny")
    assert rec["metric"] == "train_samples_per_s_per_chip"
    assert rec["value"] > 0
    assert rec["n_chips"] == 8
    assert rec["step_s"] > 0
    assert rec["supervised_tokens_per_batch"] > 0
    assert rec["trainable_params"] > 0
    assert rec["mode"] == "tiny"


@pytest.mark.slow
def test_bench_train_tiny_qlora(bench_train, monkeypatch, capsys):
    rec = _run(bench_train, monkeypatch, capsys, "tiny-qlora")
    assert rec["value"] > 0
    assert rec["mode"] == "tiny-qlora"
    # adapters only: far fewer trainable params than the full model
    assert rec["trainable_params"] > 0
