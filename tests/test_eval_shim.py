"""lmms-eval shim: command construction, results flattening, mocked launch."""

import json
import sys
import types

import pytest

from radvlm_tpu.training.eval_shim import (
    LmmsEvalArgs,
    build_command,
    evaluate,
    find_results_file,
    parse_lmms_results,
)


def test_build_command_flags():
    args = LmmsEvalArgs(
        model="llava_onevision",
        model_args="pretrained=/ckpt",
        task_names="mme,ai2d",
        batch_size=4,
        output_path="/tmp/out",
        limit=10,
        gen_kwargs="temperature=0",
    )
    cmd = build_command(args)
    assert cmd[:3] == ["python", "-m", "lmms_eval"]
    assert "--log_samples" in cmd
    assert cmd[cmd.index("--tasks") + 1] == "mme,ai2d"
    assert cmd[cmd.index("--limit") + 1] == "10"
    assert cmd[cmd.index("--gen_kwargs") + 1] == "temperature=0"


def test_parse_lmms_results_drops_alias_and_stderr():
    results = {
        "results": {
            "mme": {
                "alias": "MME",
                "mme_cognition_score,none": 300.0,
                "mme_cognition_score_stderr,none": 1.0,
            },
            "ai2d": {"exact_match,flexible-extract": 0.5},
        }
    }
    out = parse_lmms_results(results, ["mme", "ai2d"])
    assert out == {
        "mme_mme_cognition_score": 300.0,
        "ai2d_exact_match": 0.5,
    }


def test_evaluate_with_mocked_tool(tmp_path, monkeypatch, fake_module=None):
    # inject a fake lmms_eval module so the import gate passes
    monkeypatch.setitem(sys.modules, "lmms_eval", types.ModuleType("lmms_eval"))

    outdir = tmp_path / "res" / "run1"
    outdir.mkdir(parents=True)
    (outdir / "results.json").write_text(json.dumps({
        "results": {"mme": {"score,none": 1.5, "alias": "x"}}
    }))

    calls = {}

    class Proc:
        returncode = 0
        stderr = ""

    def fake_run(cmd, capture_output, text):
        calls["cmd"] = cmd
        return Proc()

    args = LmmsEvalArgs(task_names="mme", output_path=str(tmp_path / "res"))
    out = evaluate(args, runner=fake_run)
    assert out == {"mme_score": 1.5}
    assert calls["cmd"][calls["cmd"].index("--tasks") + 1] == "mme"


def test_evaluate_without_tool_raises(monkeypatch):
    monkeypatch.setitem(sys.modules, "lmms_eval", None)
    with pytest.raises((RuntimeError, ImportError)):
        evaluate(LmmsEvalArgs(task_names="mme"))


def test_find_results_file_picks_newest(tmp_path):
    import os
    import time

    a = tmp_path / "a"; a.mkdir()
    b = tmp_path / "b"; b.mkdir()
    (a / "results.json").write_text("{}")
    time.sleep(0.02)
    (b / "results.json").write_text("{}")
    os.utime(b / "results.json", None)
    assert find_results_file(str(tmp_path)).endswith("b/results.json")
