"""Validation engine: batched, on-device, one host transfer per eval.

Counterpart of reference ``validation.py:25-156``, which loops batch-1
images, syncing ``argmax -> .cpu().numpy() -> np.bincount`` per image. Here
a jitted eval step computes CE loss, argmax and the 19x19 confusion-matrix
contribution on device; the host accumulates three small scalars/matrices
across batches and computes mIoU once at the end (``per_class_iou`` /
``mean_iou`` parity with ``utils.py:62-116``).

Loss parity: the reference's reported val loss is the mean over images of
per-image CE means (batch-1 loop, ``validation.py:89-92``); with batching we
keep that exact quantity via per-image reductions plus a validity mask for
padded tail images.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..ops.augment import normalize_u8
from ..ops.losses import cross_entropy_with_ignore
from ..ops.metrics import (
    confusion_matrix,
    mean_iou,
    per_class_iou,
    per_class_iou_np,
)


def make_eval_step(cfg: ExperimentConfig, apply_fn: Callable):
    """Build ``eval_step(variables, images_u8, labels, img_valid)``.

    ``img_valid`` is a per-image bool mask (False for padding images used to
    fill the final partial batch); their pixels are excluded from both the
    confusion matrix (labels forced to ignore) and the loss average.
    Returns (hist int32 CxC, loss_sum f32, image_count f32).
    """
    num_classes = cfg.model.num_classes
    ignore = cfg.loss.ignore_index
    compute_dtype = jnp.dtype(cfg.model.compute_dtype)

    def eval_step(variables, images_u8, labels, img_valid):
        images = normalize_u8(images_u8, cfg.augment).astype(compute_dtype)
        logits = apply_fn(variables, images, False)
        labels = jnp.where(
            img_valid[:, None, None], labels, jnp.full_like(labels, ignore)
        )
        # Per-image CE mean, then masked sum (reference batch-1 semantics).
        pixel_loss = cross_entropy_with_ignore(
            logits, labels, ignore, reduction="none"
        )
        b = pixel_loss.shape[0]
        valid_px = (labels != ignore).reshape(b, -1)
        per_img = pixel_loss.reshape(b, -1).sum(1) / jnp.maximum(
            valid_px.sum(1), 1
        )
        loss_sum = jnp.where(img_valid, per_img, 0.0).sum()

        preds = jnp.argmax(logits, axis=-1)
        masked_labels = jnp.where(labels == ignore, num_classes, labels)
        hist = confusion_matrix(masked_labels, preds, num_classes)
        return hist, loss_sum, img_valid.sum().astype(jnp.float32)

    return eval_step


def evaluate(
    eval_step: Callable,
    variables,
    batches: Iterable,
    num_classes: int = 19,
) -> Dict[str, np.ndarray]:
    """Run eval over an iterable of (images_u8, labels, img_valid) batches.

    Returns {'miou', 'loss', 'per_class_iou', 'hist'} as numpy. Each batch's
    contribution stays on device; the running int32 device hist is flushed
    into a host int64 accumulator before any cell could reach 2^31 (a
    GTA5-sized eval set has ~2.3e10 pixels — a dominant class's diagonal
    cell overflows int32 long before the end; the reference accumulates in
    numpy's default int64, ``utils.py:62-89``), so host transfers stay
    O(total_pixels / 1e9) per eval rather than per batch.
    """
    hist_host = np.zeros((num_classes, num_classes), np.int64)
    hist = jnp.zeros((num_classes, num_classes), jnp.int32)
    loss_sum = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.float32)
    flush_every = None
    since_flush = 0
    for images_u8, labels, img_valid in batches:
        if flush_every is None:
            # <= 2^30 pixels binned on device between flushes keeps every
            # int32 cell exact with 2x headroom.
            px_per_batch = int(np.prod(labels.shape))
            flush_every = max(1, (1 << 30) // max(px_per_batch, 1))
        h, ls, c = eval_step(variables, images_u8, labels, img_valid)
        hist, loss_sum, count = hist + h, loss_sum + ls, count + c
        since_flush += 1
        if since_flush >= flush_every:
            hist_host += np.asarray(hist, np.int64)
            hist = jnp.zeros((num_classes, num_classes), jnp.int32)
            since_flush = 0
    hist = hist_host + np.asarray(hist, np.int64)
    # Final IoU reduction on host in float64: keeps the int64 exactness the
    # flush logic establishes (float32 rounds counts beyond 2^24; reference
    # computes in numpy float64, utils.py:92-116).
    ious = per_class_iou_np(hist)
    return {
        "miou": float(ious.mean()),
        "loss": float(loss_sum) / max(float(count), 1.0),
        "per_class_iou": ious,
        "hist": hist,
        "num_images": float(count),
    }
