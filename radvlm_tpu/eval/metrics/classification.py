"""Classification metrics: substring label matching -> micro/macro/per-label PRF.

Bit-matched rebuild of `radvlm/evaluation/compute_metrics_tasks.py:171-231`:
predicted labels are detected by case-insensitive substring presence in the
generated text; metrics are sklearn `precision_recall_fscore_support` over the
multi-label indicator matrices.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def predicted_labels_from_text(text: str, labels: Sequence[str]) -> List[str]:
    low = text.lower()
    return [l for l in labels if l.lower() in low]


def evaluate_classification(
    results: Sequence[Dict], labels: Sequence[str]
) -> Dict[str, float]:
    """results: [{"output": text, "labels": [gt label, ...]}]."""
    from sklearn.metrics import precision_recall_fscore_support

    predicted, actual = [], []
    for r in results:
        if "output" not in r or "labels" not in r:
            raise ValueError("each result needs 'output' and 'labels'")
        pred = {l.lower() for l in predicted_labels_from_text(r["output"], labels)}
        act = {l.lower() for l in r["labels"]}
        predicted.append([1 if l.lower() in pred else 0 for l in labels])
        actual.append([1 if l.lower() in act else 0 for l in labels])

    predicted = np.asarray(predicted)
    actual = np.asarray(actual)
    p_mi, r_mi, f_mi, _ = precision_recall_fscore_support(
        actual, predicted, average="micro", zero_division=0
    )
    p_ma, r_ma, f_ma, _ = precision_recall_fscore_support(
        actual, predicted, average="macro", zero_division=0
    )
    _, _, f_per, _ = precision_recall_fscore_support(
        actual, predicted, average=None, zero_division=0
    )
    return {
        "Precision(macro)": float(p_ma),
        "Precision(micro)": float(p_mi),
        "Recall(macro)": float(r_ma),
        "Recall(micro)": float(r_mi),
        "F1 Score(macro)": float(f_ma),
        "F1 Score(micro)": float(f_mi),
        **{l: float(f) for l, f in zip(labels, f_per)},
    }
