"""Synthetic-data pipelines + conversation eval with the fake LLM client."""

import json
import os

import numpy as np
import jax
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.data.llm_clients import FakeLLMClient, extract_json_array
from radvlm_tpu.data.synth import (
    filter_reports,
    format_sentences_bbox,
    generate_conversations,
)
from radvlm_tpu.eval.conversations import (
    evaluate_conversations,
    extract_judge_score,
    replay_conversation,
)
from radvlm_tpu.eval.harness import VLMRunner
from radvlm_tpu.models import radvlm


class FakeReportDS:
    def __init__(self):
        self.samples = [
            {"study_id": "s1", "img_path": "/x/a.jpg",
             "txt": "Compared to prior, stable cardiomegaly.",
             "labels": ["Cardiomegaly"], "view": "PA", "gender": "F",
             "sentencesBBox": [
                 {"observation": "enlarged heart", "box": [0.3, 0.4, 0.7, 0.8]},
             ]},
            {"study_id": "s2", "img_path": "/x/b.jpg", "txt": None},
        ]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_extract_json_array():
    assert extract_json_array('junk [1, 2, {"a": 3}] trailing') == [1, 2, {"a": 3}]
    assert extract_json_array("no array") is None
    assert extract_json_array(None) is None


def test_format_sentences_bbox():
    s = format_sentences_bbox([
        {"observation": "heart", "box": [0.3, 0.4, 0.7, 0.8]},
        {"observation": "heart", "box": [0.1, 0.1, 0.2, 0.2]},
        {"observation": "lung", "box": [0, 0, 1, 1]},
    ])
    assert "heart: [0.30, 0.40, 0.70, 0.80] [0.10, 0.10, 0.20, 0.20]" in s
    assert "lung: [0.00, 0.00, 1.00, 1.00]" in s
    assert format_sentences_bbox([{"observation": "x", "box": ["bad"]}]) is None
    assert format_sentences_bbox([]) is None


def test_filter_reports_idempotent(tmp_path):
    ds = FakeReportDS()
    client = FakeLLMClient(default="Stable cardiomegaly.")
    out = str(tmp_path / "filtered")
    assert filter_reports(ds, client, out, num_workers=2) == 1
    assert open(os.path.join(out, "s1.txt")).read() == "Stable cardiomegaly."
    # Second run: skip-if-exists resume -> 0 writes, no extra LLM calls growth.
    calls = len(client.calls)
    assert filter_reports(ds, client, out, num_workers=2) == 0
    assert len(client.calls) == calls


def test_generate_conversations(tmp_path):
    ds = FakeReportDS()
    conv = [{"from": "human", "value": "What do you see?"},
            {"from": "gpt", "value": "Cardiomegaly at [0.30, 0.40, 0.70, 0.80]."}]
    client = FakeLLMClient(default="Here it is:\n" + json.dumps(conv))
    out = str(tmp_path / "convs")
    assert generate_conversations(ds, client, out, grounded=True, num_workers=1) == 1
    saved = json.load(open(os.path.join(out, "a.json")))
    assert saved == conv
    # bbox context made it into the prompt
    assert any("[0.30, 0.40, 0.70, 0.80]" in c for c in client.calls)


def test_judge_score_extraction():
    assert extract_judge_score("blah\nOverall score: 7/10") == 7.0
    assert extract_judge_score("Overall score: 8.5 / 10") == 8.5
    assert extract_judge_score("no score") is None
    assert extract_judge_score(None) is None


class ByteTokenizer:
    eos_token_ids = (1,)
    pad_token_id = 0

    def encode(self, text):
        return [2 + b for b in text.encode()][:32]

    def decode(self, ids):
        return bytes(min(255, i - 2) for i in ids if i >= 2).decode(errors="ignore")


def test_evaluate_conversations_end_to_end(tmp_path):
    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=ByteTokenizer(),
        max_new_tokens=4, batch_size=1, pad_to_multiple=8, attn_impl="xla",
    )

    class ConvDS:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return {
                "img": np.zeros((64, 64, 3), np.uint8),
                "img_path": "/x.jpg",
                "conversation": [
                    {"from": "human", "value": "Any cardiomegaly?"},
                    {"from": "gpt", "value": "Yes, mild."},
                    {"from": "human", "value": "Where?"},
                    {"from": "gpt", "value": "At [0.30, 0.40, 0.70, 0.80]."},
                ],
            }

    judge = FakeLLMClient(default="Reasonable.\nOverall score: 6/10")
    out = tmp_path / "conv_eval.json"
    metrics = evaluate_conversations(
        runner, ConvDS(), judge, output_path=str(out)
    )
    assert metrics == {"mean_score": 6.0, "n": 1.0}
    rec = json.load(open(out))
    assert rec["records"][0]["score"] == 6.0
    # both GT user turns were replayed (2 user turns -> 4 history entries)
    assert rec["records"][0]["candidate"].count("USER:") == 2
    # judge saw both conversations
    assert "Ground-truth conversation" in judge.calls[0]


def test_synth_cli_filter_and_generate(tmp_path, monkeypatch):
    """The CLI entry (reference llm_filter_reports / llm_generate_conversations
    analog) wires datasets + client + output dirs; run both subcommands with
    the fake client over a stubbed MIMIC dataset."""
    from radvlm_tpu.data import synth_cli

    monkeypatch.setattr(
        "radvlm_tpu.data.datasets.MIMICCXRDataset",
        lambda **kw: FakeReportDS(),
    )
    rc = synth_cli.main([
        "filter-reports", "--data-dir", str(tmp_path), "--client", "fake",
        "--num-workers", "1",
    ])
    assert rc == 0
    out = tmp_path / "MIMIC-CXR-JPG" / "filtered_reports"
    assert (out / "s1.txt").exists() and not (out / "s2.txt").exists()

    rc = synth_cli.main([
        "generate-conversations", "--data-dir", str(tmp_path),
        "--client", "fake", "--grounding", "--num-workers", "1",
    ])
    assert rc == 0
    conv_dir = tmp_path / "MIMIC-CXR-JPG" / "conversations_grounded" / "train"
    convs = list(conv_dir.glob("*.json"))
    assert len(convs) == 1
    data = json.loads(convs[0].read_text())
    assert isinstance(data, list) and data
