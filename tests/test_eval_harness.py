"""End-to-end evaluation harness test: tiny model, fake tokenizer, fake dataset.

Exercises the full inference slice the reference runs per task
(`evaluate_instructions.py`): prompt build -> anyres preprocess -> batched
KV-cached generation -> decode/trim -> metric computation -> results dump.
"""

import json
import random

import numpy as np
import jax
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.data.instructions import phrase_grounding
from radvlm_tpu.eval.harness import VLMRunner, run_task
from radvlm_tpu.models import radvlm


class ByteTokenizer:
    eos_token_ids = (1,)
    pad_token_id = 0

    def encode(self, text):
        return [2 + b for b in text.encode()][:48]  # cap prompt length

    def decode(self, ids):
        # Model vocab (300) exceeds the byte range; clamp for the fake decoder.
        return bytes(min(255, i - 2) for i in ids if i >= 2).decode(errors="ignore")


class FakeGroundingDataset:
    def __init__(self, n=5):
        self.n = n
        rng = np.random.default_rng(0)
        self.samples = []
        for i in range(n):
            r = random.Random(i)
            boxes = [[0.1, 0.2, 0.5, 0.6]]
            self.samples.append({
                "img": rng.integers(0, 255, size=(64, 60, 3), dtype=np.uint8),
                "img_path": f"/fake/{i}.jpg",
                "boxes": boxes,
                "label": "cardiomegaly",
                "instr": phrase_grounding("cardiomegaly", boxes, r),
            })

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.samples[i]


@pytest.fixture(scope="module")
def runner():
    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    return VLMRunner(
        params=params,
        cfg=cfg,
        tokenizer=ByteTokenizer(),
        max_new_tokens=8,
        batch_size=2,
        pad_to_multiple=8,
        attn_impl="xla",
    )


def test_run_task_end_to_end(runner, tmp_path):
    ds = FakeGroundingDataset(5)
    results, metrics = run_task(
        runner, ds, "phrase_grounding",
        output_dir=str(tmp_path), model_name="tiny", with_clinical=False,
    )
    assert len(results) == 5
    for r in results:
        assert isinstance(r["output"], str)
        assert r["boxes"] == [[0.1, 0.2, 0.5, 0.6]]
    assert "mAP_0.5" in metrics
    dumped = json.load(open(tmp_path / "tiny_phrase_grounding_output.json"))
    assert len(dumped) == 5
    # Results-file compatibility with the reference harness
    # (`evaluate_instructions.py:182-207`): per-sample cells carry `output`
    # (generated text), `instr` (the question STRING, not a dict), `answer`
    # (ground-truth text), plus the reference's optional keys present on the
    # sample — so consumers of the reference's `*_output.json` can read ours.
    for cell in dumped:
        assert isinstance(cell["output"], str)
        assert isinstance(cell["instr"], str)
        assert "answer" in cell
        assert cell["img_path"].startswith("/fake/")
        assert cell["label"] == "cardiomegaly"
        assert cell["boxes"] == [[0.1, 0.2, 0.5, 0.6]]
    m = json.load(open(tmp_path / "tiny_phrase_grounding.json"))
    assert "mAP_0.5" in m


def test_generate_batch_partial_batch(runner):
    # 1 prompt with batch_size 2 -> batch padded with filler, filler dropped.
    img = np.zeros((64, 64, 3), np.uint8)
    outs = runner.generate_batch(["<image>\nq1"], [[img]])
    assert len(outs) == 1 and isinstance(outs[0], str)


def test_run_task_continuous_engine(runner, tmp_path):
    ds = FakeGroundingDataset(4)
    results, metrics = run_task(
        runner, ds, "phrase_grounding", engine="continuous",
        with_clinical=False,
    )
    assert len(results) == 4
    assert all(isinstance(r["output"], str) for r in results)
    assert "mAP_0.5" in metrics


def test_prompt_build(runner):
    p = runner.build_prompt("<image>\nDescribe.", history=[("user", "hi"), ("assistant", "hello")])
    assert p.endswith("<|im_start|>assistant\n")
    assert "hello" in p and "Describe." in p
