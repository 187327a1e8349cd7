"""Dataset-adapter tests over synthetic on-disk fixtures.

The reference has no dataset tests (SURVEY.md §4 — verification was a notebook);
here each adapter is exercised against a miniature fake archive with the real file
layout: split filtering, label semantics (NaN/-1 handling), report fallback order,
WBF fusion, per-phrase grouping, and instruction generation.
"""

import json
import os

import numpy as np
import pytest

from radvlm_tpu.data import datasets as ds
from radvlm_tpu.data.wbf import weighted_boxes_fusion, fuse_annotator_boxes


def _write_img(path):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(path)


# ---------------------------------------------------------------------------
# WBF
# ---------------------------------------------------------------------------


def test_wbf_merges_overlapping():
    boxes = [[[0.1, 0.1, 0.5, 0.5]], [[0.12, 0.1, 0.52, 0.5]]]
    scores = [[1.0], [1.0]]
    labels = [[0], [0]]
    fused, fscores, flabels = weighted_boxes_fusion(
        boxes, scores, labels, iou_thr=0.1
    )
    assert fused.shape == (1, 4)
    np.testing.assert_allclose(fused[0], [0.11, 0.1, 0.51, 0.5], atol=1e-6)
    assert fscores[0] == pytest.approx(1.0)


def test_wbf_keeps_disjoint_and_labels():
    boxes = [[[0.0, 0.0, 0.2, 0.2], [0.7, 0.7, 0.9, 0.9]]]
    scores = [[1.0, 1.0]]
    labels = [[0, 1]]
    fused, _, flabels = weighted_boxes_fusion(boxes, scores, labels, iou_thr=0.1)
    assert fused.shape == (2, 4)
    assert set(flabels.tolist()) == {0, 1}


def test_fuse_annotator_boxes():
    boxes = [[0.1, 0.1, 0.5, 0.5], [0.11, 0.1, 0.51, 0.5], [0.7, 0.7, 0.9, 0.9]]
    labels = [0, 0, 0]
    annotators = [1, 2, 1]
    fused, flabels = fuse_annotator_boxes(boxes, labels, annotators, iou_thr=0.1)
    assert fused.shape == (2, 4)


# ---------------------------------------------------------------------------
# MIMIC-CXR
# ---------------------------------------------------------------------------


@pytest.fixture
def mimic_root(tmp_path):
    import pandas as pd

    root = tmp_path / "mimic"
    root.mkdir()
    meta = pd.DataFrame({
        "dicom_id": ["d1", "d2", "d3"],
        "subject_id": [10001234, 10001234, 10005678],
        "study_id": [50001, 50002, 50003],
        "ViewPosition": ["PA", "LATERAL", "AP"],
        "Rows": [2500, 2500, 3000],
        "Columns": [3000, 3000, 2500],
    })
    split = pd.DataFrame({
        "dicom_id": ["d1", "d2", "d3"],
        "subject_id": [10001234, 10001234, 10005678],
        "study_id": [50001, 50002, 50003],
        "split": ["train", "train", "test"],
    })
    chex = pd.DataFrame({
        "subject_id": [10001234, 10001234, 10005678],
        "study_id": [50001, 50002, 50003],
        "Cardiomegaly": [1.0, np.nan, -1.0],
        "Edema": [0.0, 1.0, np.nan],
        "No Finding": [np.nan, np.nan, np.nan],
    })
    reports = pd.DataFrame({
        "study": ["s50001", "s50002", "s50003"],
        "findings": ["Heart is enlarged.", np.nan, np.nan],
        "impression": [np.nan, "Mild edema.", np.nan],
        "last_paragraph": [np.nan, np.nan, "Uncertain cardiomegaly."],
    })
    meta.to_csv(root / "mimic-cxr-2.0.0-metadata.csv", index=False)
    split.to_csv(root / "mimic-cxr-2.0.0-split.csv", index=False)
    chex.to_csv(root / "mimic-cxr-2.0.0-chexpert.csv", index=False)
    reports.to_csv(root / "reports.csv", index=False)
    for d, s, st in [("d1", "10001234", "50001"), ("d2", "10001234", "50002"),
                     ("d3", "10005678", "50003")]:
        _write_img(str(root / "files" / f"p{s[:2]}" / f"p{s}" / f"s{st}" / f"{d}.jpg"))
    return str(root)


def test_mimic_split_and_reports(mimic_root):
    train = ds.MIMICCXRDataset(mimic_root, split="train", flag_img=False)
    assert len(train) == 2
    s0 = train[0]
    assert s0["txt"] == "Heart is enlarged."  # findings preferred
    assert s0["labels"] == ["Cardiomegaly"]
    assert "question" in s0["instr"] and s0["instr"]["answer"] == s0["txt"]
    s1 = train[1]
    assert s1["txt"] == "Mild edema."  # impression fallback
    assert s1["labels"] == ["Edema"]

    test = ds.MIMICCXRDataset(mimic_root, split="test", flag_img=False)
    assert len(test) == 1
    # -1 (uncertain) maps to positive.
    assert test[0]["labels"] == ["Cardiomegaly"]
    assert test[0]["txt"] == "Uncertain cardiomegaly."  # last_paragraph fallback


def test_mimic_frontal_filter_and_image(mimic_root):
    train = ds.MIMICCXRDataset(mimic_root, split="train", only_frontal=True)
    assert len(train) == 1
    s = train[0]
    assert s["view"] == "PA"
    assert s["img"].shape == (32, 32, 3) and s["img"].dtype == np.uint8
    assert os.path.exists(s["img_path"])


def test_mimic_filtered_reports_dir(mimic_root, tmp_path):
    fr = tmp_path / "filtered"
    fr.mkdir()
    (fr / "50001.txt").write_text("Filtered report one.")
    train = ds.MIMICCXRDataset(
        mimic_root, split="train", flag_img=False,
        filtered_reports_dir=str(fr),
    )
    assert len(train) == 1  # only studies with a filtered report remain
    assert train[0]["txt"] == "Filtered report one."


def test_mimic_classif_instruction(mimic_root):
    train = ds.MIMICCXRDataset(
        mimic_root, split="train", flag_img=False, classif=True
    )
    instr = train[0]["instr"]
    assert "Cardiomegaly" in instr["answer"]


# ---------------------------------------------------------------------------
# CheXpert
# ---------------------------------------------------------------------------


@pytest.fixture
def chexpert_root(tmp_path):
    import pandas as pd

    root = tmp_path / "chexpert"
    root.mkdir()
    df = pd.DataFrame({
        "Path": [
            "CheXpert-v1.0-small/train/patient1/study1/view1_frontal.jpg",
            "CheXpert-v1.0-small/train/patient1/study2/view1_lateral.jpg",
            "CheXpert-v1.0-small/train/patient2/study1/view1_frontal.jpg",
        ],
        "Sex": ["Male", "Male", "Female"],
        "Age": [50, 50, 60],
        "No Finding": [np.nan, np.nan, 1.0],
        "Cardiomegaly": [-1.0, 1.0, np.nan],
        "Support Devices": [np.nan, np.nan, 1.0],
    })
    df.to_csv(root / "train.csv", index=False)
    for p in df["Path"]:
        _write_img(str(root / p.replace("CheXpert-v1.0-small/", "")))
    return str(root)


def test_chexpert_labels_and_frontal(chexpert_root):
    d = ds.CheXpertDataset(chexpert_root, split="train", flag_img=False)
    assert len(d) == 2  # lateral filtered
    # Uncertain -1 -> positive.
    assert d[0]["labels"] == ["Cardiomegaly"]
    # Healthy row keeps Support Devices (not zeroed).
    assert d[1]["labels"] == ["Support Devices"]
    assert "instr" in d[0]


# ---------------------------------------------------------------------------
# VinDr-CXR
# ---------------------------------------------------------------------------


@pytest.fixture
def vindr_root(tmp_path):
    import pandas as pd

    root = tmp_path / "vindr"
    (root / "annotations").mkdir(parents=True)
    ann = pd.DataFrame({
        "image_id": ["imgA", "imgA", "imgA", "imgB"],
        "class_name": ["Cardiomegaly", "Cardiomegaly", "Pleural effusion",
                       "No finding"],
        "rad_id": ["R1", "R2", "R1", "R1"],
        "x_min": [100.0, 110.0, 500.0, np.nan],
        "y_min": [100.0, 100.0, 600.0, np.nan],
        "x_max": [400.0, 410.0, 800.0, np.nan],
        "y_max": [400.0, 400.0, 900.0, np.nan],
    })
    ann.to_csv(root / "annotations" / "annotations_test.csv", index=False)
    (root / "annotations" / "image_resolutions_test.json").write_text(
        json.dumps({"imgA": [1000, 1000], "imgB": [1000, 1000]})
    )
    for i in ("imgA", "imgB"):
        _write_img(str(root / "test_jpg" / f"{i}.jpg"))
    return str(root)


def test_vindr_wbf_and_no_finding(vindr_root):
    d = ds.VinDrCXRDataset(vindr_root, split="test", flag_img=False)
    assert len(d) == 2
    by_path = {os.path.basename(s["img_path"]): s for s in (d[0], d[1])}
    a = by_path["imgA.jpg"]
    # Two overlapping Cardiomegaly boxes fuse into one; Pleural effusion separate.
    assert sorted(a["labels"]) == ["Cardiomegaly", "Pleural effusion"]
    assert len(a["boxes"]) == 2
    cardio = a["boxes"][a["labels"].index("Cardiomegaly")]
    np.testing.assert_allclose(cardio, [0.105, 0.1, 0.405, 0.4], atol=1e-3)
    b = by_path["imgB.jpg"]
    assert b["labels"] == ["No finding"] and b["boxes"] == []
    assert "no abnormal" in b["instr"]["answer"].lower()


def test_vindr_single_label(vindr_root):
    d = ds.VinDrCXRSingleLabelDataset(vindr_root, split="test", flag_img=False)
    assert len(d) == 2  # (imgA, Cardiomegaly), (imgA, Pleural effusion)
    labels = {d[i]["label"] for i in range(len(d))}
    assert labels == {"Cardiomegaly", "Pleural effusion"}
    s = d[0]
    assert "[0." in s["instr"]["answer"]  # 2-decimal bbox format


# ---------------------------------------------------------------------------
# MS-CXR (over the MIMIC fixture)
# ---------------------------------------------------------------------------


def test_mscxr_grouping(mimic_root, tmp_path):
    sb = tmp_path / "sentences_bbox"
    sb.mkdir()
    (sb / "d1.json").write_text(json.dumps([
        {"observation": "enlarged cardiac silhouette", "box": [0.2, 0.3, 0.6, 0.7]},
        {"observation": "enlarged cardiac silhouette", "box": [0.1, 0.2, 0.3, 0.4]},
        {"observation": "right pleural effusion", "box": [0.5, 0.6, 0.9, 0.95]},
    ]))
    d = ds.MSCXRDataset(
        root=mimic_root, split="train", sentences_bbox_dir=str(sb), flag_img=False
    )
    assert len(d) == 2  # two distinct phrases on d1
    phrases = {d[i]["label"]: d[i] for i in range(len(d))}
    assert len(phrases["enlarged cardiac silhouette"]["boxes"]) == 2
    assert len(phrases["right pleural effusion"]["boxes"]) == 1
    instr = phrases["right pleural effusion"]["instr"]
    assert "[0.50, 0.60, 0.90, 0.95]" in instr["answer"]


# ---------------------------------------------------------------------------
# Chest ImaGenome (over the MIMIC fixture)
# ---------------------------------------------------------------------------


def test_chest_imagenome(mimic_root, tmp_path):
    ima = tmp_path / "chestima"
    (ima / "silver_dataset" / "splits").mkdir(parents=True)
    (ima / "silver_dataset" / "scene_graph").mkdir()
    import pandas as pd

    pd.DataFrame({
        "dicom_id": ["d1"], "subject_id": [10001234], "study_id": [50001],
        "ViewPosition": ["PA"],
    }).to_csv(ima / "silver_dataset" / "splits" / "train.csv", index=False)
    graph = {
        "viewpoint": "PA",
        "gender": "M",
        "objects": [
            {"bbox_name": "right lung", "original_x1": 300, "original_y1": 250,
             "original_x2": 1500, "original_y2": 2000},
            {"bbox_name": "cardiac silhouette", "original_x1": 1000,
             "original_y1": 1200, "original_x2": 2100, "original_y2": 2300},
        ],
    }
    (ima / "silver_dataset" / "scene_graph" / "d1_SceneGraph.json").write_text(
        json.dumps(graph)
    )
    d = ds.ChestImaGenomeDataset(
        root=mimic_root, chestima_root=str(ima), split="train",
        pick_one_region=True, flag_img=False,
    )
    assert len(d) == 1
    s = d[0]
    assert s["label"] in ("right lung", "cardiac silhouette")
    box = s["boxes"][0]
    assert all(0.0 <= c <= 1.0 for c in box)  # normalized by Columns/Rows
    assert s["label"] in s["instr"]["question"] or s["label"] in s["instr"]["answer"]
    # missing-ids cache got created
    # per-split cache (a shared one leaked one split's missing set into another)
    assert os.path.exists(ima / "silver_dataset" / "missing_ids_train.json")


# ---------------------------------------------------------------------------
# PadChest-GR
# ---------------------------------------------------------------------------


@pytest.fixture
def padchest_root(tmp_path):
    import pandas as pd

    root = tmp_path / "padchest"
    root.mkdir()
    pd.DataFrame({
        "ImageID": ["im1.png", "im2.png"],
        "split": ["train", "train"],
        "PatientSex_DICOM": ["F", "M"],
    }).to_csv(root / "master_table.csv", index=False)
    pd.DataFrame({
        "ImageID": ["im1.png", "im2.png"],
        "Projection": ["PA", "L"],  # im2 filtered out
        "Report": ["cardiomegalia leve.", "otro."],
    }).to_csv(
        root / "PADCHEST_chest_x_ray_images_labels_160K_01.02.19.csv", index=False
    )
    (root / "grounded_reports_20240819.json").write_text(json.dumps([
        {"ImageID": "im1.png", "findings": [
            {"sentence_en": "mild cardiomegaly", "boxes": [[0.3, 0.4, 0.7, 0.8]]},
            {"sentence_en": "no boxes finding", "boxes": []},
        ]},
        {"ImageID": "im2.png", "findings": [
            {"sentence_en": "something", "boxes": [[0.1, 0.1, 0.2, 0.2]]},
        ]},
    ]))
    for i in ("im1.png", "im2.png"):
        _write_img(str(root / "images_grounding" / i))
    return str(root)


def test_padchest_grounding(padchest_root):
    d = ds.PadChestGroundingDataset(padchest_root, split="train", flag_img=False)
    assert len(d) == 1  # im2 lateral-filtered; empty-boxes finding skipped
    s = d[0]
    assert s["label"] == "mild cardiomegaly"
    assert s["txt"] == "cardiomegalia leve."
    assert s["gender"] == "F"
    assert "[0.30, 0.40, 0.70, 0.80]" in s["instr"]["answer"]


def test_padchest_per_image(padchest_root, tmp_path):
    d = ds.PadChestGroundingPerImageDataset(
        padchest_root, split="train", flag_img=False
    )
    assert len(d) == 1
    assert len(d[0]["sentencesBBox"]) == 1
    # With conversation_dir, only images that have a conversation file remain.
    conv = tmp_path / "convs"
    conv.mkdir()
    d2 = ds.PadChestGroundingPerImageDataset(
        padchest_root, split="train", conversation_dir=str(conv), flag_img=False
    )
    assert len(d2) == 0
    (conv / "im1.json").write_text(json.dumps([{"from": "human", "value": "hi"}]))
    d3 = ds.PadChestGroundingPerImageDataset(
        padchest_root, split="train", conversation_dir=str(conv), flag_img=False
    )
    assert len(d3) == 1 and d3[0]["conversation"][0]["value"] == "hi"


def test_instruction_reproducibility(mimic_root):
    a = ds.MIMICCXRDataset(mimic_root, split="train", flag_img=False, seed=3)
    b = ds.MIMICCXRDataset(mimic_root, split="train", flag_img=False, seed=3)
    assert a[0]["instr"] == b[0]["instr"]
    c = ds.MIMICCXRDataset(mimic_root, split="train", flag_img=False, seed=4)
    qs = {ds.MIMICCXRDataset(mimic_root, split="train", flag_img=False, seed=s)[0][
        "instr"]["question"] for s in range(8)}
    assert len(qs) > 1  # different seeds draw different templates


def test_report_generation_german_suffixe():
    """Multilingual knob parity: `german_suffixe` appends " in German" to the
    question (reference `create_instructions.py:139-157`)."""
    import random

    from radvlm_tpu.data import instructions as instr_lib

    rng = random.Random(0)
    instr = instr_lib.report_generation("Befund ...", rng, german_suffixe=True)
    assert instr["question"].endswith(" in German")
    assert instr["answer"] == "Befund ..."
    plain = instr_lib.report_generation("Report.", rng)
    assert not plain["question"].endswith(" in German")
