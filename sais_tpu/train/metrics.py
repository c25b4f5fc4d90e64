"""Epoch metrics (reference: prepare_miscellaneous.py:97-208).

Host-side numpy/sklearn, same quantities as the reference: accuracy, ovr
ROC-AUC (NaN on failure, :156-159), macro precision/recall; prototype-path
probabilities are TTA-averaged before scoring (:128-137); logits-path TTA is
logit-averaged (:171-173).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from sais_tpu.models.heads import labels_to_prototype_columns


def _scores(labels: np.ndarray, preds: np.ndarray,
            probs: np.ndarray, nclasses: int) -> Dict[str, float]:
    from sklearn.metrics import (precision_score, recall_score,
                                 roc_auc_score)
    acc = float(np.mean(preds == labels))
    prec = float(precision_score(labels, preds, average="macro",
                                 zero_division=0))
    rec = float(recall_score(labels, preds, average="macro",
                             zero_division=0))
    auc_probs = probs[:, -1] if nclasses == 2 else probs
    try:
        auc = float(roc_auc_score(labels, auc_probs, multi_class="ovr"))
    except Exception:
        auc = float("nan")
    return {"acc": acc, "auc": auc, "precision": prec, "recall": rec}


def prototype_metrics(tta_probs: Sequence[np.ndarray], labels: Sequence,
                      prototype_keys: Sequence[str]) -> Dict[str, float]:
    """calcNCEMetrics: mean probs over TTA augments, argmax preds, label
    columns via the string-matching rule."""
    probs = np.mean(np.stack(tta_probs, 0), 0)
    cols = labels_to_prototype_columns(labels, prototype_keys)
    preds = np.argmax(probs, axis=1)
    return _scores(cols, preds, probs, len(prototype_keys))


def logits_metrics(tta_logits: Sequence[np.ndarray], labels: np.ndarray,
                   nclasses: int) -> Dict[str, float]:
    """calcMetrics: mean logits over TTA, then softmax/sigmoid preds."""
    logits = np.mean(np.stack(tta_logits, 0), 0)
    if nclasses == 1:
        probs = 1.0 / (1.0 + np.exp(-logits))
        preds = (probs > 0.5).astype(np.int64).reshape(-1)
        probs2 = np.concatenate([1 - probs, probs], axis=-1)
        return _scores(np.asarray(labels), preds, probs2, 2)
    z = logits - logits.max(axis=-1, keepdims=True)
    probs = np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True)
    preds = np.argmax(probs, axis=1)
    return _scores(np.asarray(labels), preds, probs, nclasses)


def format_metrics(phase: str, metrics: Dict[str, float]) -> str:
    """printMetrics-style single-row table (prepare_miscellaneous.py:197-203)."""
    names = [f"{phase}_{k}" for k in metrics]
    vals = [f"{v:.3f}" for v in metrics.values()]
    w = [max(len(a), len(b)) for a, b in zip(names, vals)]
    line1 = "  ".join(n.ljust(x) for n, x in zip(names, w))
    line2 = "  ".join(v.ljust(x) for v, x in zip(vals, w))
    return line1 + "\n" + line2


class MetricsTracker:
    """trackMetrics (prepare_miscellaneous.py:205-208): append-per-epoch."""

    def __init__(self):
        self.history: Dict[str, List[float]] = {}

    def update(self, metrics: Dict[str, float]) -> None:
        for k, v in metrics.items():
            self.history.setdefault(k, []).append(v)
