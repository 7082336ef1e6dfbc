"""Pure-numpy oracle implementations of the reference algorithms.

These re-state the math of the reference (torch) implementations in numpy so
the JAX kernels can be verified against an independent executable spec:
- lovasz_softmax_oracle: reference losses/lovasz_loss.py:47-200 semantics
  (per present class, ignore-masked, descending error sort, Lovasz gradient).
- cross_entropy_oracle: torch CrossEntropyLoss(ignore_index, 'mean').
- fast_hist / per_class_iou: reference utils.py:62-116.
"""

from __future__ import annotations

import numpy as np


def lovasz_grad_oracle(gt_sorted: np.ndarray) -> np.ndarray:
    p = len(gt_sorted)
    gts = gt_sorted.sum()
    intersection = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard[1:p] = jaccard[1:p] - jaccard[0:-1]
    return jaccard


def lovasz_softmax_oracle(
    probas: np.ndarray, labels: np.ndarray, ignore: int | None = 255
) -> float:
    """probas: (P, C) float64; labels: (P,) int."""
    C = probas.shape[1]
    losses = []
    present_classes = np.unique(labels)
    for c in present_classes:
        if ignore is not None and c == ignore:
            continue
        fg = (labels == c).astype(np.float64)
        if ignore is not None:
            valid = labels != ignore
            probas_c = probas[valid, c]
            fg = fg[valid]
        else:
            probas_c = probas[:, c]
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probas_c)
        order = np.argsort(-errors, kind="stable")
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        losses.append(float(np.dot(errors_sorted, lovasz_grad_oracle(fg_sorted))))
    if not losses:
        return 0.0
    return float(np.mean(losses))


def cross_entropy_oracle(
    logits: np.ndarray, labels: np.ndarray, ignore: int = 255
) -> float:
    """logits: (P, C); labels: (P,). Mean over valid pixels."""
    valid = labels != ignore
    if valid.sum() == 0:
        return 0.0
    lg = logits[valid].astype(np.float64)
    lb = labels[valid].astype(np.int64)
    lse = np.log(np.exp(lg - lg.max(axis=1, keepdims=True)).sum(axis=1)) + lg.max(
        axis=1
    )
    return float(np.mean(lse - lg[np.arange(len(lb)), lb]))


def bce_with_logits_oracle(logits: np.ndarray, target: float) -> float:
    x = logits.astype(np.float64)
    z = np.full_like(x, target)
    return float(
        np.mean(np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x))))
    )


def fast_hist_oracle(
    label_true: np.ndarray, label_pred: np.ndarray, n_class: int
) -> np.ndarray:
    mask = (
        (label_true >= 0)
        & (label_true < n_class)
        & (label_pred >= 0)
        & (label_pred < n_class)
    )
    return np.bincount(
        n_class * label_true[mask].astype(int) + label_pred[mask],
        minlength=n_class**2,
    ).reshape(n_class, n_class)


def per_class_iou_oracle(hist: np.ndarray) -> np.ndarray:
    eps = 1e-5
    ious = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist) + eps)
    return np.nan_to_num(ious, nan=0.0)
