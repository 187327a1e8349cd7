"""Metric parity tests: grounding mAP/IoU, classification PRF, BLEU/ROUGE/CIDEr-D.

NLG scorers are cross-checked for bit-parity against the reference's vendored
coco-caption scorers when /root/reference is mounted (skipped otherwise) — the
systematic version of the reference's golden-output habit (SURVEY.md §4).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from radvlm_tpu.eval.metrics import (
    evaluate_boxes,
    evaluate_classification,
    evaluate_results,
)
from radvlm_tpu.eval.metrics.boxes import box_iou, extract_boxes
from radvlm_tpu.eval.metrics.clinical import (
    green,
    green_prompt,
    parse_green_response,
)
from radvlm_tpu.eval.metrics.nlg import bleu4, cider_d, rouge

REF = "/root/reference/radvlm/evaluation/vilmedic/NLG"

REPORTS_REF = [
    "The heart is enlarged . There is a small right pleural effusion .",
    "No acute cardiopulmonary abnormality .",
    "Bibasilar atelectasis without focal consolidation .",
    "There is mild pulmonary edema and cardiomegaly .",
]
REPORTS_HYP = [
    "The heart is mildly enlarged . Small right pleural effusion is present .",
    "No acute abnormality .",
    "There is bibasilar atelectasis . No focal consolidation .",
    "Mild pulmonary edema .",
]


def _load_ref_module(relpath, name):
    path = os.path.join(REF, relpath)
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_extract_boxes_regex():
    text = "Found at [0.12, 0.30, 0.55, 0.90] and [0.1,0.2,0.3,0.4]. Not [1, 2]."
    assert extract_boxes(text) == [[0.12, 0.3, 0.55, 0.9], [0.1, 0.2, 0.3, 0.4]]


def test_box_iou():
    assert box_iou([0, 0, 1, 1], [0, 0, 1, 1]) == pytest.approx(1.0)
    assert box_iou([0, 0, 1, 1], [2, 2, 3, 3]) == 0.0
    assert box_iou([0, 0, 2, 2], [1, 1, 3, 3]) == pytest.approx(1 / 7)


def test_evaluate_boxes_perfect_and_miss():
    results = [
        {"output": "at [0.10, 0.10, 0.50, 0.50]", "boxes": [[0.1, 0.1, 0.5, 0.5]]},
        {"output": "at [0.80, 0.80, 0.90, 0.90]", "boxes": [[0.1, 0.1, 0.5, 0.5]]},
        {"output": "no boxes here", "boxes": [[0.1, 0.1, 0.5, 0.5]]},
    ]
    m = evaluate_boxes(results)
    assert m["mAP_0.5"] == pytest.approx(1 / 3)
    assert 0 < m["avg_iou"] < 1


def test_evaluate_boxes_multi_pred_ordering():
    # One correct then one duplicate prediction: AP = 1.0 (envelope), not 0.5.
    results = [{
        "output": "[0.10, 0.10, 0.50, 0.50] then [0.10, 0.10, 0.50, 0.50]",
        "boxes": [[0.1, 0.1, 0.5, 0.5]],
    }]
    assert evaluate_boxes(results, avg_iou=False)["mAP_0.5"] == pytest.approx(1.0)


def test_classification_metrics():
    labels = ["cardiomegaly", "edema", "pneumonia"]
    results = [
        {"output": "Findings: Cardiomegaly and edema.", "labels": ["Cardiomegaly"]},
        {"output": "No abnormalities.", "labels": ["Edema"]},
    ]
    m = evaluate_classification(results, labels)
    # sample1: pred {cardio, edema}, actual {cardio} -> tp=1 fp=1
    # sample2: pred {}, actual {edema} -> fn=1
    assert m["Precision(micro)"] == pytest.approx(1 / 2)
    assert m["Recall(micro)"] == pytest.approx(1 / 2)
    assert m["cardiomegaly"] == pytest.approx(1.0)
    assert m["pneumonia"] == 0.0


def test_evaluate_results_dispatch():
    m = evaluate_results("phrase_grounding", [
        {"output": "[0.10, 0.10, 0.50, 0.50]", "boxes": [[0.1, 0.1, 0.5, 0.5]]},
    ])
    assert "mAP_0.5" in m
    m = evaluate_results(
        "report_generation",
        [{"output": h, "txt": r} for r, h in zip(REPORTS_REF, REPORTS_HYP)],
        with_clinical=False,
    )
    assert set(m) >= {"blue", "ciderd", "rouge1", "rouge2", "rougel"}
    with pytest.raises(ValueError):
        evaluate_results("nope", [])


def test_bleu_parity_with_reference():
    ref_bleu = _load_ref_module("bleu/bleu_scorer.py", "ref_bleu_scorer")
    scorer = ref_bleu.BleuScorer(n=4)
    for r, h in zip(REPORTS_REF, REPORTS_HYP):
        scorer += (h, [r])
    ref_score, ref_list = scorer.compute_score(option="closest")
    ours, ours_list = bleu4(REPORTS_REF, REPORTS_HYP)
    assert ours == pytest.approx(ref_score[3], rel=1e-9)
    np.testing.assert_allclose(ours_list, ref_list[3], rtol=1e-9)


def test_ciderd_parity_with_reference():
    ref_mod = _load_ref_module("ciderD/ciderD_scorer.py", "ref_ciderd_scorer")
    scorer = ref_mod.CiderScorer(n=4, sigma=6.0)
    for r, h in zip(REPORTS_REF, REPORTS_HYP):
        scorer += (h, [r])
    ref_mean, ref_scores = scorer.compute_score()
    ours_mean, ours_scores = cider_d(REPORTS_REF, REPORTS_HYP)
    assert ours_mean == pytest.approx(float(ref_mean), rel=1e-9)
    np.testing.assert_allclose(ours_scores, ref_scores, rtol=1e-9)


def test_rouge_sanity():
    mean, per = rouge(["a b c d"], ["a b c d"], "rougel")
    assert mean == pytest.approx(1.0)
    mean, _ = rouge(["a b c d"], ["x y z"], "rouge1")
    assert mean == 0.0


def test_green_parsing_and_scoring():
    resp = (
        "(a) False report of a finding in the candidate: 1\n"
        "(b) Missing a finding present in the reference: 0\n"
        "(c) Misidentification of a finding's anatomic location/position: 0\n"
        "(d) Misassessment of the severity of a finding: 2\n"
        "(e) Mentioning a comparison that isn't in the reference: 0\n"
        "(f) Omitting a comparison detailing a change from a prior study: 0\n"
        "Matched findings: 3\n"
    )
    counts = parse_green_response(resp)
    assert counts["a"] == 1 and counts["d"] == 2 and counts["matched"] == 3
    # score = 3 / (3 + 3)
    mean, scores = green(["ref"], ["hyp"], judge=lambda p: resp)
    assert mean == pytest.approx(0.5)
    assert parse_green_response("garbage") is None
    assert "Reference report" in green_prompt("r", "c")
