"""Dataset adapters for the 6 public CXR corpora (TPU-framework data layer, L0).

Rebuild of `radvlm/data/datasets.py` (reference, 1291 LoC): 9 adapters exposing the
same sample-dict contract (`img_path`, `img`, `txt`, `labels`, `boxes`, `label`,
`instr`, `conversation`, `sentencesBBox`, `view`, `gender`) over the raw public
archives, so the instruction exporters and the evaluation harness interoperate.

Differences from the reference (intentional, TPU-first):
- images load as raw uint8 HWC RGB numpy (PIL); pixel normalization happens once in
  the device-side anyres pipeline (`radvlm_tpu/ops/image_ops.py`), not per-adapter
  (the reference normalizes to [-1024,1024] via torchxrayvision and then *re*-
  normalizes in the HF processor).
- no torch dependency: adapters are plain Sequence-style classes usable from any
  loader.
- WBF is in-repo (`radvlm_tpu/data/wbf.py`) instead of the ensemble-boxes package.
- per-sample RNG is an explicit `random.Random(seed + idx)` so instruction template
  draws are reproducible AND parallelizable (the reference uses global seeding).

File-layout contracts (path names, CSV columns) follow the public datasets:
MIMIC-CXR (physionet), CheXpert(-Plus), Chest ImaGenome silver, VinDr-CXR,
MS-CXR sentence-bbox JSONs, PadChest-GR.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
from collections import defaultdict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from radvlm_tpu.data import instructions as instr_lib
from radvlm_tpu.data.wbf import fuse_annotator_boxes, weighted_boxes_fusion

DATA_DIR = os.environ.get("DATA_DIR")

CHEXPERT_PATHOLOGIES = sorted([
    "Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity", "Lung Lesion",
    "Edema", "Consolidation", "Pneumonia", "Atelectasis",
    "Pneumothorax", "Pleural Effusion", "Pleural Other",
    "Fracture", "Support Devices",
])

Sample = Dict[str, Any]


def load_image(path: str) -> np.ndarray:
    """JPEG/PNG -> uint8 [H, W, 3] RGB numpy.

    RADVLM_NATIVE_JPEG=1 routes .jpg/.jpeg through the C++ libjpeg decoder
    (`native/jpeg.cc`, GIL-free in the prefetch pool); PIL remains the default
    and the fallback for other formats / decode errors."""
    if os.environ.get("RADVLM_NATIVE_JPEG") == "1" and path.lower().endswith(
        (".jpg", ".jpeg")
    ):
        try:
            from radvlm_tpu import native

            if native.jpeg_available():
                with open(path, "rb") as f:
                    return native.decode_jpeg(f.read())
        except (ValueError, RuntimeError, OSError):
            pass  # fall through to PIL
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def _rng_for(seed: int, idx: int) -> random.Random:
    return random.Random((seed << 20) ^ idx)


def _read_json(path: str):
    with open(path) as f:
        return json.load(f)


def _listdir_stems(d: str, suffix: str) -> set:
    return {f[: -len(suffix)] for f in os.listdir(d) if f.endswith(suffix)}


class CXRDataset:
    """Base: len/getitem + shared flags."""

    flag_img: bool = True
    flag_instr: bool = True
    seed: int = 0

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Sample:
        raise NotImplementedError

    def _maybe_img(self, sample: Sample) -> None:
        if self.flag_img:
            sample["img"] = load_image(sample["img_path"])


# ---------------------------------------------------------------------------
# MIMIC-CXR family
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MIMICCXRDataset(CXRDataset):
    """MIMIC-CXR: reports + CheXpert labels (reference `datasets.py:593-816`).

    Expects under `root`: files/ (JPEGs p<xx>/p<subject>/s<study>/<dicom>.jpg),
    mimic-cxr-2.0.0-split.csv, mimic-cxr-2.0.0-chexpert.csv,
    mimic-cxr-2.0.0-metadata.csv, reports.csv (study, findings, impression,
    last_paragraph).
    """

    root: str
    split: str = "train"
    only_frontal: bool = False
    filtered_reports_dir: Optional[str] = None
    sentences_bbox_dir: Optional[str] = None
    conversation_dir: Optional[str] = None
    gender_json: Optional[str] = None
    classif: bool = False
    flag_img: bool = True
    flag_txt: bool = True
    flag_instr: bool = True
    flag_lab: bool = True
    seed: int = 0

    def __post_init__(self):
        import pandas as pd

        split_name = {"train": "train", "valid": "validate", "test": "test"}
        if self.split not in split_name:
            raise ValueError(f"bad split {self.split!r}")

        meta = pd.read_csv(os.path.join(self.root, "mimic-cxr-2.0.0-metadata.csv"))
        splitcsv = pd.read_csv(os.path.join(self.root, "mimic-cxr-2.0.0-split.csv"))
        chexpert = pd.read_csv(os.path.join(self.root, "mimic-cxr-2.0.0-chexpert.csv"))
        reports = pd.read_csv(os.path.join(self.root, "reports.csv"))
        reports["study"] = reports["study"].astype(str).str.lstrip("s").astype(int)

        df = meta.merge(splitcsv, on=["dicom_id", "subject_id", "study_id"])
        df = df.merge(chexpert, on=["subject_id", "study_id"], how="left")
        df = df.merge(
            reports, left_on="study_id", right_on="study", how="inner"
        )
        df = df[df["split"] == split_name[self.split]]
        if self.only_frontal:
            df = df[df["ViewPosition"].isin(["PA", "AP"])]
        if self.filtered_reports_dir:
            have = _listdir_stems(self.filtered_reports_dir, ".txt")
            df = df[df["study_id"].astype(str).isin(have)]
        if self.conversation_dir:
            have = _listdir_stems(self.conversation_dir, ".json")
            df = df[df["dicom_id"].isin(have)]
        if self.sentences_bbox_dir:
            have = _listdir_stems(self.sentences_bbox_dir, ".json")
            df = df[df["dicom_id"].isin(have)]

        df = df.reset_index(drop=True)
        # Label matrix: NaN->0, uncertain (-1)->1 (reference contract,
        # datasets.py:703-717).
        lab = df.reindex(columns=CHEXPERT_PATHOLOGIES).fillna(0).replace(-1, 1)
        self._labels = lab.to_numpy(np.float32)
        self._df = df
        self._genders = _read_json(self.gender_json) if self.gender_json else None

    def __len__(self) -> int:
        return len(self._df)

    def _img_path(self, row) -> str:
        s = str(row["subject_id"])
        return os.path.join(
            self.root, "files", f"p{s[:2]}", f"p{s}",
            f"s{row['study_id']}", f"{row['dicom_id']}.jpg",
        )

    def _report_text(self, row) -> str:
        if self.filtered_reports_dir:
            with open(
                os.path.join(self.filtered_reports_dir, f"{row['study_id']}.txt")
            ) as f:
                return f.read()
        # findings, else impression, else last paragraph (datasets.py:772-786).
        import pandas as pd

        for col in ("findings", "impression", "last_paragraph"):
            v = row.get(col)
            if pd.notna(v) and v != 0:
                return str(v).replace("\n", "")
        return ""

    def __getitem__(self, idx: int) -> Sample:
        row = self._df.iloc[idx]
        rng = _rng_for(self.seed, idx)
        dicom_id = str(row["dicom_id"])
        sample: Sample = {
            "idx": idx,
            "study_id": str(row["study_id"]),
            "dicom_id": dicom_id,
            "img_path": self._img_path(row),
            "view": row.get("ViewPosition"),
            "gender": (self._genders or {}).get(dicom_id),
        }
        self._maybe_img(sample)
        if self.flag_txt or self.flag_instr:
            txt = self._report_text(row)
            if self.flag_txt:
                sample["txt"] = txt
            if self.flag_instr:
                sample["instr"] = instr_lib.report_generation(txt, rng)
        if self.flag_lab:
            lab = self._labels[idx]
            sample["labels"] = [
                p for p, v in zip(CHEXPERT_PATHOLOGIES, lab) if v == 1
            ]
            if self.flag_instr and self.classif:
                sample["instr"] = instr_lib.classification(sample["labels"], rng)
        if self.sentences_bbox_dir:
            p = os.path.join(self.sentences_bbox_dir, dicom_id + ".json")
            sample["sentencesBBox"] = _read_json(p) if os.path.exists(p) else None
        if self.conversation_dir:
            p = os.path.join(self.conversation_dir, dicom_id + ".json")
            if os.path.exists(p):
                sample["conversation"] = _read_json(p)
        return sample


@dataclasses.dataclass
class ChestImaGenomeDataset(MIMICCXRDataset):
    """Chest ImaGenome: MIMIC images + scene-graph anatomical region bboxes
    (reference `datasets.py:820-1030`). `chestima_root` holds
    silver_dataset/{splits/*.csv, scene_graph/*_SceneGraph.json}."""

    chestima_root: str = ""
    pick_one_region: bool = True

    def __post_init__(self):
        super().__post_init__()
        import pandas as pd

        splits = os.path.join(self.chestima_root, "silver_dataset", "splits")
        self._scene_dir = os.path.join(
            self.chestima_root, "silver_dataset", "scene_graph"
        )
        name = "valid" if self.split == "valid" else self.split
        ids = pd.read_csv(os.path.join(splits, f"{name}.csv"))

        # Missing scene-graph cache (some silver ids ship without graphs).
        # Per-split file: a shared cache computed from one split's dicom_ids
        # would let another split's graph-less samples through the filter and
        # crash __getitem__ mid-epoch (code-review finding).
        cache = os.path.join(
            self.chestima_root, "silver_dataset", f"missing_ids_{name}.json"
        )
        if os.path.exists(cache):
            missing = set(_read_json(cache))
        else:
            missing = {
                d for d in ids["dicom_id"]
                if not os.path.isfile(
                    os.path.join(self._scene_dir, f"{d}_SceneGraph.json")
                )
            }
            try:
                with open(cache, "w") as f:
                    json.dump(sorted(missing), f)
            except OSError:
                pass
        keep = set(ids["dicom_id"]) - missing
        mask = self._df["dicom_id"].isin(keep).to_numpy()
        self._df = self._df[mask].reset_index(drop=True)
        self._labels = self._labels[mask]

    def __getitem__(self, idx: int) -> Sample:
        sample = super().__getitem__(idx)
        rng = _rng_for(self.seed ^ 0x5EED, idx)
        row = self._df.iloc[idx]
        graph = _read_json(
            os.path.join(self._scene_dir, f"{row['dicom_id']}_SceneGraph.json")
        )
        w, h = float(row["Columns"]), float(row["Rows"])
        objs = graph.get("objects", [])

        def norm_box(o):
            return [
                float(o["original_x1"]) / w, float(o["original_y1"]) / h,
                float(o["original_x2"]) / w, float(o["original_y2"]) / h,
            ]

        if self.pick_one_region and objs:
            o = objs[rng.randrange(len(objs))]
            sample["boxes"] = [norm_box(o)]
            sample["label"] = o["bbox_name"]
            if self.flag_instr:
                sample["instr"] = instr_lib.region_location(
                    sample["label"], sample["boxes"], rng
                )
        else:
            sample["boxes"] = [norm_box(o) for o in objs]
            sample["region_names"] = [o["bbox_name"] for o in objs]
        sample["view"] = graph.get("viewpoint", sample.get("view"))
        sample["gender"] = graph.get("gender", sample.get("gender"))
        return sample


@dataclasses.dataclass
class MSCXRDataset(MIMICCXRDataset):
    """MS-CXR phrase grounding: one sample per (image, phrase), all boxes for the
    phrase grouped together (reference `datasets.py:1034-1157`)."""

    def __post_init__(self):
        if not self.sentences_bbox_dir:
            raise ValueError("MSCXRDataset requires sentences_bbox_dir")
        super().__post_init__()
        self._flat: List[Dict[str, Any]] = []
        for i in range(len(self._df)):
            row = self._df.iloc[i]
            dicom_id = str(row["dicom_id"])
            path = os.path.join(self.sentences_bbox_dir, dicom_id + ".json")
            if not os.path.exists(path):
                continue
            by_phrase: Dict[str, List] = defaultdict(list)
            for entry in _read_json(path):
                by_phrase[entry["observation"]].append(entry["box"])
            for phrase, boxes in by_phrase.items():
                self._flat.append({
                    "dicom_id": dicom_id,
                    "img_path": self._img_path(row),
                    "phrase": phrase,
                    "boxes": boxes,
                })

    def __len__(self) -> int:
        return len(self._flat)

    def __getitem__(self, idx: int) -> Sample:
        rec = self._flat[idx]
        rng = _rng_for(self.seed, idx)
        sample: Sample = {
            "img_path": rec["img_path"],
            "dicom_id": rec["dicom_id"],
            "boxes": rec["boxes"],
            "label": rec["phrase"],
            "sentencesBBox": [
                {"observation": rec["phrase"], "box": b} for b in rec["boxes"]
            ],
        }
        self._maybe_img(sample)
        if self.flag_instr:
            sample["instr"] = instr_lib.phrase_grounding(
                rec["phrase"], rec["boxes"], rng
            )
        return sample


# ---------------------------------------------------------------------------
# CheXpert family
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CheXpertDataset(CXRDataset):
    """CheXpert classification (reference `datasets.py:310-399`)."""

    root: str
    split: str = "train"
    only_frontal: bool = True
    unique_patients: bool = False
    flag_img: bool = True
    flag_instr: bool = True
    flag_lab: bool = True
    seed: int = 0

    def __post_init__(self):
        import pandas as pd

        csv_name = {"train": "train.csv", "valid": "valid.csv", "test": "test.csv"}
        if self.split not in csv_name:
            raise ValueError(f"bad split {self.split!r}")
        df = pd.read_csv(os.path.join(self.root, csv_name[self.split]))
        if self.only_frontal:
            df = df[df["Path"].str.contains(r"frontal\.jpg$")]
        if self.unique_patients:
            df = (
                df.assign(PatientID=df["Path"].str.extract(r"(patient\d+)", expand=False))
                .groupby("PatientID").first().reset_index()
            )
        df = df.reset_index(drop=True)
        lab = df.reindex(columns=CHEXPERT_PATHOLOGIES).copy()
        # "No Finding"==1 rows: zero all pathologies except Support Devices
        # (reference datasets.py:370-377), then uncertain -1 -> positive.
        if "No Finding" in df.columns:
            healthy = df["No Finding"] == 1
            for p in CHEXPERT_PATHOLOGIES:
                if p != "Support Devices" and p in lab.columns:
                    lab.loc[healthy, p] = 0
        lab = lab.fillna(0).replace(-1, 1)
        self._labels = lab.to_numpy(np.float32)
        self._df = df

    def __len__(self) -> int:
        return len(self._df)

    def _img_path(self, row) -> str:
        rel = str(row["Path"])
        for prefix in ("CheXpert-v1.0-small/", "CheXpert-v1.0/"):
            rel = rel.replace(prefix, "")
        return os.path.join(self.root, rel)

    def __getitem__(self, idx: int) -> Sample:
        row = self._df.iloc[idx]
        rng = _rng_for(self.seed, idx)
        sample: Sample = {"idx": idx, "img_path": self._img_path(row)}
        self._maybe_img(sample)
        labels = [
            p for p, v in zip(CHEXPERT_PATHOLOGIES, self._labels[idx]) if v == 1
        ]
        if self.flag_lab:
            sample["labels"] = labels
        if self.flag_instr:
            sample["instr"] = instr_lib.classification(labels, rng)
        return sample


@dataclasses.dataclass
class CheXpertPlusDataset(CXRDataset):
    """CheXpert-Plus report generation (reference `datasets.py:1164-1291`).

    Expects df_chexpert_plus_240401.csv + chexbert_labels/report_fixed.json
    (jsonl) under `root`.
    """

    root: str
    split: str = "train"
    only_frontal: bool = True
    filtered_reports_dir: Optional[str] = None
    flag_img: bool = True
    flag_txt: bool = True
    flag_instr: bool = True
    flag_lab: bool = True
    seed: int = 0

    def __post_init__(self):
        import pandas as pd

        df = pd.read_csv(os.path.join(self.root, "df_chexpert_plus_240401.csv"))
        if self.split == "train":
            df = df[df["split"] == "train"]
        elif self.split == "test":
            df = df[df["split"] == "valid"]  # reference maps test->valid rows
        else:
            raise ValueError("CheXpertPlus supports splits 'train' and 'test'")
        if self.only_frontal and "frontal_lateral" in df.columns:
            df = df[df["frontal_lateral"] == "Frontal"]
        if self.filtered_reports_dir:
            have = set(os.listdir(self.filtered_reports_dir))
            df = df[df["path_to_image"].map(
                lambda p: "_".join(str(p).split("/")[:3]) + ".txt"
            ).isin(have)]
        self._df = df.reset_index(drop=True)
        self._labels: Dict[str, Dict] = {}
        labels_file = os.path.join(self.root, "chexbert_labels", "report_fixed.json")
        if os.path.exists(labels_file):
            with open(labels_file) as f:
                for line in f:
                    rec = json.loads(line)
                    self._labels[rec.pop("path_to_image")] = rec

    def __len__(self) -> int:
        return len(self._df)

    def __getitem__(self, idx: int) -> Sample:
        import pandas as pd

        row = self._df.iloc[idx]
        rng = _rng_for(self.seed, idx)
        rel = str(row["path_to_image"])
        sample: Sample = {"idx": idx, "img_path": os.path.join(self.root, rel)}
        self._maybe_img(sample)
        if self.flag_txt or self.flag_instr:
            if self.filtered_reports_dir:
                name = "_".join(rel.split("/")[:3]) + ".txt"
                with open(os.path.join(self.filtered_reports_dir, name)) as f:
                    txt = f.read()
            else:
                parts = [
                    str(row[c]) for c in (
                        "section_findings", "section_impression",
                        "section_end_of_impression",
                    ) if c in row.index and pd.notna(row[c])
                ]
                txt = "".join(parts).capitalize().replace("\n", "")
            if self.flag_txt:
                sample["txt"] = txt
            if self.flag_instr:
                sample["instr"] = instr_lib.report_generation(txt, rng)
        if self.flag_lab:
            rec = self._labels.get(rel, {})
            sample["labels"] = [k for k, v in rec.items() if v == 1.0]
        return sample


# ---------------------------------------------------------------------------
# VinDr-CXR
# ---------------------------------------------------------------------------


def _vindr_load_fused(root: str, split: str):
    """Read annotations_{split}.csv + image_resolutions_{split}.json, WBF-fuse
    multi-radiologist boxes per (image, class) at iou 0.1 with normalized coords
    (reference `datasets.py:405-505`, `utils.py:112-132`)."""
    import pandas as pd

    ann_dir = "annotations" if os.path.isdir(os.path.join(root, "annotations")) else ""
    res = _read_json(
        os.path.join(root, ann_dir, f"image_resolutions_{split}.json")
    )
    ann = pd.read_csv(os.path.join(root, ann_dir, f"annotations_{split}.csv"))
    ann = ann.rename(columns={"rad_ID": "rad_id"})

    fused: Dict[str, List[Tuple[str, List[float]]]] = defaultdict(list)
    image_ids: List[str] = []
    seen: set = set()
    for (image_id, class_name), grp in ann.groupby(["image_id", "class_name"]):
        if image_id not in seen:  # `in fused` misses rows that never insert
            seen.add(image_id)
            image_ids.append(image_id)
        fused[image_id]  # touch: image exists even with no boxes
        if class_name == "No finding":
            continue
        w, h = res.get(image_id, [1024, 1024])
        sub = grp.dropna(subset=["x_min", "y_min", "x_max", "y_max"])
        if not len(sub):
            continue
        raw = sub[["x_min", "y_min", "x_max", "y_max"]].to_numpy(float)
        norm = raw / np.asarray([w, h, w, h], float)
        # Per-ANNOTATOR lists, the reference's apply_wbf grouping
        # (`utils.py:112-132`): WBF treats each outer list as one model.
        rads = (
            sub["rad_id"].tolist() if "rad_id" in sub.columns
            else [0] * len(sub)
        )
        boxes, _ = fuse_annotator_boxes(
            norm.tolist(), [0] * len(norm), rads, iou_thr=0.1
        )
        for b in np.asarray(boxes):
            fused[image_id].append((class_name, [round(float(c), 4) for c in b]))
    return fused, image_ids


@dataclasses.dataclass
class VinDrCXRDataset(CXRDataset):
    """VinDr-CXR multi-label abnormality detection (reference
    `datasets.py:405-505`): one sample per image, all fused (label, box) pairs."""

    root: str
    split: str = "train"
    flag_img: bool = True
    flag_instr: bool = True
    seed: int = 0

    def __post_init__(self):
        if self.split not in ("train", "test"):
            raise ValueError("VinDr split must be train|test")
        self._fused, self._ids = _vindr_load_fused(self.root, self.split)

    def __len__(self) -> int:
        return len(self._ids)

    def __getitem__(self, idx: int) -> Sample:
        image_id = self._ids[idx]
        rng = _rng_for(self.seed, idx)
        pairs = self._fused.get(image_id, [])
        boxes = [b for _, b in pairs]
        labels = [l for l, _ in pairs] or ["No finding"]
        sample: Sample = {
            "img_path": os.path.join(self.root, f"{self.split}_jpg", image_id + ".jpg"),
            "boxes": boxes,
            "labels": labels,
        }
        self._maybe_img(sample)
        if self.flag_instr:
            findings = [] if labels == ["No finding"] else list(zip(labels, boxes))
            sample["instr"] = instr_lib.abnormality_detection(findings, rng)
        return sample


@dataclasses.dataclass
class VinDrCXRSingleLabelDataset(CXRDataset):
    """VinDr-CXR per-(image,label) grounding samples (reference
    `datasets.py:509-588`)."""

    root: str
    split: str = "train"
    flag_img: bool = True
    flag_instr: bool = True
    seed: int = 0

    def __post_init__(self):
        fused, ids = _vindr_load_fused(self.root, self.split)
        self._entries: List[Tuple[str, str, List[List[float]]]] = []
        for image_id in ids:
            by_label: Dict[str, List] = defaultdict(list)
            for label, box in fused.get(image_id, []):
                by_label[label].append(box)
            for label, boxes in by_label.items():
                self._entries.append((image_id, label, boxes))

    def __len__(self) -> int:
        return len(self._entries)

    def __getitem__(self, idx: int) -> Sample:
        image_id, label, boxes = self._entries[idx]
        rng = _rng_for(self.seed, idx)
        sample: Sample = {
            "idx": idx,
            "img_path": os.path.join(self.root, f"{self.split}_jpg", image_id + ".jpg"),
            "label": label,
            "boxes": boxes,
        }
        self._maybe_img(sample)
        if self.flag_instr:
            sample["instr"] = instr_lib.abnormality_grounding(label, boxes, rng)
        return sample


# ---------------------------------------------------------------------------
# PadChest-GR
# ---------------------------------------------------------------------------


def _padchest_tables(root: str, split: str):
    import pandas as pd

    if split == "valid":
        split = "validation"
    master = pd.read_csv(os.path.join(root, "master_table.csv"))
    master = master[master["split"] == split]
    gender = master.set_index("ImageID")["PatientSex_DICOM"].to_dict()
    reports = pd.read_csv(
        os.path.join(root, "PADCHEST_chest_x_ray_images_labels_160K_01.02.19.csv")
    )
    reports = reports[reports["Projection"].isin(["AP", "PA"])]
    rep = reports.set_index("ImageID")["Report"].to_dict()
    view = reports.set_index("ImageID")["Projection"].to_dict()
    grounded = _read_json(os.path.join(root, "grounded_reports_20240819.json"))
    return gender, rep, view, grounded


@dataclasses.dataclass
class PadChestGroundingDataset(CXRDataset):
    """PadChest-GR per-finding phrase grounding (reference `datasets.py:29-144`)."""

    root: str
    split: str = "train"
    flag_img: bool = True
    flag_instr: bool = True
    flag_txt: bool = True
    seed: int = 0

    def __post_init__(self):
        gender, rep, _, grounded = _padchest_tables(self.root, self.split)
        self._samples = []
        for entry in grounded:
            image_id = entry["ImageID"]
            if image_id not in gender or image_id not in rep:
                continue
            for finding in entry.get("findings", []):
                boxes = finding.get("boxes", [])
                if not boxes:
                    continue
                self._samples.append({
                    "img_path": os.path.join(self.root, "images_grounding", image_id),
                    "phrase": finding["sentence_en"],
                    "boxes": boxes,
                    "gender": gender[image_id],
                    "txt": rep.get(image_id, ""),
                })

    def __len__(self) -> int:
        return len(self._samples)

    def __getitem__(self, idx: int) -> Sample:
        rec = self._samples[idx]
        rng = _rng_for(self.seed, idx)
        sample: Sample = {
            "img_path": rec["img_path"],
            "label": rec["phrase"],
            "boxes": rec["boxes"],
            "gender": rec["gender"],
        }
        if self.flag_txt:
            sample["txt"] = rec["txt"]
        self._maybe_img(sample)
        if self.flag_instr:
            sample["instr"] = instr_lib.phrase_grounding(
                rec["phrase"], rec["boxes"], rng
            )
        return sample


@dataclasses.dataclass
class PadChestGroundingPerImageDataset(CXRDataset):
    """PadChest-GR per-image samples with all (phrase, box) pairs + optional
    conversations (reference `datasets.py:149-305`)."""

    root: str
    split: str = "train"
    conversation_dir: Optional[str] = None
    flag_img: bool = True
    flag_txt: bool = True
    flag_instr: bool = True
    seed: int = 0

    def __post_init__(self):
        gender, rep, view, grounded = _padchest_tables(self.root, self.split)
        per_image: Dict[str, List[Dict]] = defaultdict(list)
        for entry in grounded:
            image_id = entry["ImageID"]
            if image_id not in gender or image_id not in rep:
                continue
            for finding in entry.get("findings", []):
                for box in finding.get("boxes", []):
                    per_image[image_id].append(
                        {"observation": finding["sentence_en"], "box": box}
                    )
        self._samples = []
        for image_id, obs in per_image.items():
            conv_path = None
            if self.conversation_dir is not None:
                base, _ = os.path.splitext(image_id)
                conv_path = os.path.join(self.conversation_dir, base + ".json")
                if not os.path.exists(conv_path):
                    continue
            self._samples.append({
                "img_path": os.path.join(self.root, "images_grounding", image_id),
                "sentencesBBox": obs,
                "gender": gender[image_id],
                "view": view.get(image_id),
                "txt": rep.get(image_id, ""),
                "conversation_file": conv_path,
            })

    def __len__(self) -> int:
        return len(self._samples)

    def __getitem__(self, idx: int) -> Sample:
        rec = self._samples[idx]
        sample: Sample = {
            "img_path": rec["img_path"],
            "sentencesBBox": rec["sentencesBBox"],
            "gender": rec["gender"],
            "view": rec["view"],
        }
        if self.flag_txt:
            sample["txt"] = rec["txt"]
        self._maybe_img(sample)
        if rec["conversation_file"]:
            sample["conversation"] = _read_json(rec["conversation_file"])
        return sample
