"""Segmentation metric kernels, computed on device.

TPU-native counterparts of the reference's numpy helpers
(``utils.py:62-89`` ``fast_hist`` and ``utils.py:92-116`` ``per_class_iou``):
the confusion matrix accumulates *on device* inside the jitted eval step (one
one-hot GEMM on the MXU per batch, a single host transfer per evaluation)
instead of a per-image ``.cpu().numpy()`` + ``np.bincount`` round-trip
(reference ``validation.py:98-109``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(
    labels: jnp.ndarray, preds: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Confusion matrix hist[i, j] = #pixels with true label i, prediction j.

    Pixels whose true or predicted label falls outside [0, num_classes) are
    dropped — this is exactly the validity mask of the reference's
    ``fast_hist`` (``utils.py:79-84``), which also implements ignore_index=255
    filtering. Any shape; int dtypes.

    Returns an (num_classes, num_classes) int32 matrix.
    """
    # MXU formulation: hist = onehot(labels)^T @ onehot(preds). A scatter-add
    # (bincount) serializes on TPU; this is a (C+1, P) x (P, C+1) matmul the
    # systolic array eats at memory speed. Invalid pixels route to an
    # overflow class that is sliced away. f32 GEMM accumulation counts
    # exactly only to 2^24 per cell, so inputs are processed in chunks of at
    # most 2^22 pixels whose exact f32 partial counts are summed in int32
    # (exact to 2^31) — correct for any eval batch size.
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    chunk = 1 << 22
    total = labels.shape[0]
    n_chunks = -(-total // chunk)
    pad = n_chunks * chunk - total
    if pad:
        labels = jnp.pad(labels, (0, pad), constant_values=-1)
        preds = jnp.pad(preds, (0, pad), constant_values=-1)
    labels = labels.reshape(n_chunks, chunk)
    preds = preds.reshape(n_chunks, chunk)

    def one_chunk(carry, lp):
        l, p = lp
        valid = (l >= 0) & (l < num_classes) & (p >= 0) & (p < num_classes)
        overflow = num_classes
        l = jnp.where(valid, l, overflow)
        p = jnp.where(valid, p, overflow)
        oh_l = jax.nn.one_hot(l, num_classes + 1, dtype=jnp.bfloat16)
        oh_p = jax.nn.one_hot(p, num_classes + 1, dtype=jnp.bfloat16)
        hist = jax.lax.dot_general(
            oh_l, oh_p,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry + hist[:num_classes, :num_classes].astype(jnp.int32), None

    init = jnp.zeros((num_classes, num_classes), jnp.int32)
    hist, _ = jax.lax.scan(one_chunk, init, (labels, preds))
    return hist


def per_class_iou(hist: jnp.ndarray, epsilon: float = 1e-5) -> jnp.ndarray:
    """Per-class IoU = TP / (TP + FP + FN) from a confusion matrix.

    Parity with reference ``utils.py:92-116``: the same 1e-5 epsilon in the
    denominator and NaN->0 replacement (a class absent from both labels and
    predictions scores 0, and with the epsilon the ratio is 0/eps = 0 anyway).
    """
    hist = hist.astype(jnp.float64 if hist.dtype == jnp.int64 else jnp.float32)
    tp = jnp.diag(hist)
    denom = hist.sum(axis=1) + hist.sum(axis=0) - tp + epsilon
    ious = tp / denom
    return jnp.nan_to_num(ious, nan=0.0)


def per_class_iou_np(hist, epsilon: float = 1e-5):
    """Host float64 per-class IoU — exact for int64 histograms.

    The reference computes IoU in numpy default float64 (``utils.py:92-116``);
    the device kernel above is float32, which rounds counts beyond 2^24. The
    eval loop accumulates an exact int64 host histogram, so its final IoU
    reduction uses this helper to keep that exactness end to end. Same
    epsilon and NaN->0 semantics as ``per_class_iou``.
    """
    import numpy as np

    hist = np.asarray(hist, np.float64)
    tp = np.diag(hist)
    denom = hist.sum(axis=1) + hist.sum(axis=0) - tp + epsilon
    with np.errstate(invalid="ignore"):
        ious = tp / denom
    return np.nan_to_num(ious, nan=0.0)


def mean_iou(hist: jnp.ndarray, epsilon: float = 1e-5) -> jnp.ndarray:
    """Scalar mIoU = mean over classes of per-class IoU.

    The reference computes ``np.nanmean`` over per-class IoUs
    (``validation.py:135-136``); since ``per_class_iou`` already maps NaN->0
    this equals the plain mean, which is what we take."""
    return per_class_iou(hist, epsilon).mean()
