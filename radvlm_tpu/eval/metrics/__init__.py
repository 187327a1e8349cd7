"""Task-metric registry (rebuild of `compute_metrics_tasks.evaluate_results`,
`radvlm/evaluation/compute_metrics_tasks.py:6-36`)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from radvlm_tpu.eval.metrics.boxes import evaluate_boxes, extract_boxes, box_iou
from radvlm_tpu.eval.metrics.classification import evaluate_classification
from radvlm_tpu.eval.metrics.nlg import bleu4, cider_d, rouge

GROUNDING_TASKS = (
    "object_grounding",
    "region_grounding",
    "abnormality_grounding",
    "abnormality_detection",
    "phrase_grounding",
)


def evaluate_reports(
    refs: Sequence[str],
    hyps: Sequence[str],
    *,
    with_clinical: bool = True,
) -> Dict[str, float]:
    """BLEU/ROUGE/CIDEr-D always; BERTScore/RadGraph/CheXbert when their optional
    deps + weights are present (reference `vilmedic/utils.py:36-66`; the 'blue' key
    spelling is the reference's)."""
    metrics: Dict[str, float] = {
        "blue": bleu4(refs, hyps)[0],
        "ciderd": cider_d(refs, hyps)[0],
        "rouge1": rouge(refs, hyps, "rouge1")[0],
        "rouge2": rouge(refs, hyps, "rouge2")[0],
        "rougel": rouge(refs, hyps, "rougel")[0],
    }
    if with_clinical:
        from radvlm_tpu.eval.metrics import clinical

        avail = clinical.available_clinical_metrics()
        if avail.get("bertscore"):
            metrics["bertscore"] = clinical.bertscore(refs, hyps)[0]
        if avail.get("radgraph"):
            s, p, c = clinical.radgraph_f1(refs, hyps)
            metrics.update(
                radgraph_simple=s, radgraph_partial=p, radgraph_complete=c
            )
        if avail.get("chexbert"):
            metrics.update(clinical.chexbert_f1(refs, hyps))
    return metrics


def evaluate_results(
    task: str,
    results: Sequence[Dict],
    *,
    labels: Optional[Sequence[str]] = None,
    with_clinical: bool = True,
) -> Dict[str, float]:
    """results: list of dicts with 'output' plus task-specific ground truth
    ('boxes' for grounding, 'labels' for classification, 'txt' for reports)."""
    if task in GROUNDING_TASKS:
        return evaluate_boxes(results, avg_iou=True)
    if task == "abnormality_classification":
        if labels is None:
            raise ValueError("classification needs the label vocabulary")
        return evaluate_classification(results, [l.lower() for l in labels])
    if task == "report_generation":
        refs = [r["txt"] for r in results]
        hyps = [r["output"] for r in results]
        return evaluate_reports(refs, hyps, with_clinical=with_clinical)
    raise ValueError(f"Unsupported task: {task}")
