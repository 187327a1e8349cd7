"""Generic VQA driver (eval/vqa_cli.py): chunk sharding, multi-turn batched
rounds, and the evaluate_interleave answers-JSONL contract."""

import json

import jax
import numpy as np
import pytest
from PIL import Image

from radvlm_tpu import config as cfglib
from radvlm_tpu.eval.harness import VLMRunner
from radvlm_tpu.eval.vqa_cli import get_chunk, run_vqa, split_list
from radvlm_tpu.models import radvlm


class ByteTokenizer:
    eos_token_ids = (1,)
    pad_token_id = 0

    def encode(self, text):
        return [2 + b for b in text.encode()][:48]

    def decode(self, ids):
        return bytes(min(255, i - 2) for i in ids if i >= 2).decode(
            errors="ignore"
        )


def test_chunk_semantics():
    lst = list(range(10))
    # reference ceil-split (`model_vqa.py:23-31`)
    assert split_list(lst, 4) == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]
    assert get_chunk(lst, 4, 3) == [9]
    # a 2-item list ceil-splits into only TWO chunks; the reference would
    # IndexError on chunk_idx>=2 — we hand those workers an empty shard
    assert get_chunk([1, 2], 4, 0) == [1]
    assert get_chunk([1, 2], 4, 1) == [2]
    assert get_chunk([1, 2], 4, 2) == []


@pytest.fixture(scope="module")
def runner():
    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    return VLMRunner(
        params=params, cfg=cfg, tokenizer=ByteTokenizer(),
        max_new_tokens=4, batch_size=2, pad_to_multiple=8, attn_impl="xla",
    )


@pytest.mark.slow
def test_run_vqa_end_to_end(runner, tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, size=(48, 40, 3), dtype=np.uint8)
        ).save(img_dir / f"{i}.png")

    questions = [
        {  # two-round conversation
            "sample_id": "s0",
            "metadata": {"dataset": "fake", "question_type": "open-ended"},
            "image": ["0.png", "1.png"],
            "conversations": [
                {"from": "human", "value": "<image>\n<image>\nCompare."},
                {"from": "gpt", "value": "gt one"},
                {"from": "human", "value": "And the difference?"},
                {"from": "gpt", "value": "gt two"},
            ],
        },
        {  # single round, single image (string form)
            "sample_id": "s1",
            "metadata": {"dataset": "fake", "question_type": "multi-choice"},
            "image": "2.png",
            "conversations": [
                {"from": "human", "value": "<image>\nWhat is shown? a: x b: y"},
                {"from": "gpt", "value": "a: x"},
            ],
        },
    ]
    answers = tmp_path / "out" / "answers.jsonl"
    n = run_vqa(
        runner, questions,
        image_folder=str(img_dir), answers_file=str(answers),
        model_id="tiny", max_new_tokens=4,
    )
    assert n == 3  # 2 rounds for s0 + 1 for s1
    records = [json.loads(l) for l in answers.read_text().splitlines()]
    assert len(records) == 3
    # round 0 batches BOTH samples, round 1 only s0
    assert [r["sample_id"] for r in records] == ["s0", "s1", "s0"]
    r = records[0]
    assert set(r) == {"dataset", "sample_id", "prompt", "pred_response",
                      "gt_response", "shortuuid", "model_id", "question_type"}
    assert r["gt_response"] == "gt one"
    assert records[2]["gt_response"] == "gt two"
    assert records[2]["prompt"] == "And the difference?"
    assert len({rec["shortuuid"] for rec in records}) == 3
    # the interleave scorer consumes these records directly
    from radvlm_tpu.eval.interleave import evaluate_results

    scores = evaluate_results(records)
    assert scores  # per-dataset rows exist
