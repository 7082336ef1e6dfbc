"""Segmentation and adversarial losses, shape-static and jit-compatible.

Counterparts of the reference's loss surface:

- :func:`cross_entropy_with_ignore` == ``nn.CrossEntropyLoss(ignore_index=255)``
  (reference ``main.py:296-302``), channel-last logits.
- :func:`lovasz_softmax` == ``losses/lovasz_loss.py:76-200`` (the flat
  per-batch "present classes" variant). The reference iterates
  ``torch.unique(labels)`` and boolean-masks pixels — both shape-dynamic and
  untraceable. This version is exactly equivalent but shape-static: every one
  of the C classes is processed (absent classes masked out of the final mean),
  and ignored pixels are excluded by giving them a sort key below any real
  error so they land *after* all valid pixels in the descending error order,
  with their error contribution zeroed. Because every valid position precedes
  every invalid one, the Lovasz-gradient cumulative sums at valid positions
  are untouched — the dot product is bit-for-bit the same sum as the
  reference's masked computation (up to float summation order).
- :func:`bce_with_logits` == ``nn.BCEWithLogitsLoss()``
  (reference ``main_adversarial.py:238-240``), numerically-stable form.

All math runs in float32 regardless of input dtype (models compute in bf16 on
the MXU; losses are reductions and belong in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_with_ignore(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Softmax cross-entropy over channel-last logits with an ignore label.

    Args:
      logits: (..., C) raw scores (any float dtype; upcast to f32).
      labels: (...) integer class ids; ``ignore_index`` pixels contribute
        nothing and are excluded from the denominator (torch
        ``CrossEntropyLoss(ignore_index=..., reduction='mean')`` semantics).
      reduction: 'mean' (over all valid pixels in the batch — the reference's
        train-time semantics), 'mean_per_image' (mean over valid pixels of
        each leading-axis element, then mean of those — the reference's
        batch-1 validation loop semantics, ``validation.py:89-92``, kept exact
        for batched eval), or 'none' (per-pixel losses, 0 at ignored pixels).
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1
    ).squeeze(-1)
    pixel_loss = jnp.where(valid, logz - true_logit, 0.0)
    if reduction == "none":
        return pixel_loss
    if reduction == "mean":
        denom = jnp.maximum(valid.sum(), 1)
        return pixel_loss.sum() / denom
    if reduction == "mean_per_image":
        b = pixel_loss.shape[0]
        per_img_sum = pixel_loss.reshape(b, -1).sum(axis=1)
        per_img_cnt = jnp.maximum(valid.reshape(b, -1).sum(axis=1), 1)
        return (per_img_sum / per_img_cnt).mean()
    raise ValueError(f"unknown reduction {reduction!r}")


def _lovasz_grad_from_sorted(fg_sorted: jnp.ndarray, gts: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. descending-sorted errors.

    Parity with reference ``lovasz_loss.py:47-70``: jaccard_i = 1 - I_i/U_i
    over prefix sums, then first differences."""
    intersection = gts - jnp.cumsum(fg_sorted)
    union = gts + jnp.cumsum(1.0 - fg_sorted)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int | None = 255,
    classes: str = "present",
) -> jnp.ndarray:
    """Lovasz-Softmax loss (flat, batch-level) — a direct mIoU surrogate.

    Args:
      probas: (..., C) softmax probabilities, channel-last.
      labels: (...) integer ground truth with optional ``ignore_index``.
      classes: 'present' averages only over classes present among valid
        pixels (the reference's mode); 'all' averages over every class.

    The C per-class computations run as a sequential ``lax.scan`` so peak
    memory stays at O(P) per class rather than O(C*P) — each step is one
    XLA sort over all pixels (the same work the reference does eagerly per
    present class, ``lovasz_loss.py:142-183``).
    """
    num_classes = probas.shape[-1]
    probas = probas.reshape(-1, num_classes).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.int32)

    if ignore_index is not None:
        valid = labels != ignore_index
    else:
        valid = jnp.ones_like(labels, dtype=bool)
    validf = valid.astype(jnp.float32)

    def per_class(carry, c):
        loss_sum, present_cnt = carry
        p_c = probas[:, c]
        fg = (labels == c).astype(jnp.float32) * validf
        errors = jnp.abs(fg - p_c) * validf
        # Descending sort on errors with invalid pixels forced to the tail:
        # sort ascending on -key, invalid key = -1 < 0 <= any valid error.
        key = -jnp.where(valid, errors, -1.0)
        _, errors_sorted, fg_sorted = jax.lax.sort(
            (key, errors, fg), num_keys=1
        )
        gts = fg.sum()
        grad = _lovasz_grad_from_sorted(fg_sorted, gts)
        loss_c = jnp.dot(errors_sorted, grad)
        if classes == "present":
            present = (gts > 0).astype(jnp.float32)
        else:
            present = jnp.float32(1.0)
        return (loss_sum + loss_c * present, present_cnt + present), None

    (loss_sum, present_cnt), _ = jax.lax.scan(
        per_class, (jnp.float32(0.0), jnp.float32(0.0)), jnp.arange(num_classes)
    )
    # Empty mean -> 0 (reference mean(..., empty=0), lovasz_loss.py:19-44).
    return jnp.where(present_cnt > 0, loss_sum / jnp.maximum(present_cnt, 1.0), 0.0)


def bce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray | float
) -> jnp.ndarray:
    """Mean binary cross-entropy with logits (stable formulation).

    Equivalent to torch ``BCEWithLogitsLoss()`` with a broadcast target —
    the reference always uses constant maps ``full_like(logits, 0 or 1)``
    (``train.py:252-278``)."""
    x = logits.astype(jnp.float32)
    z = jnp.broadcast_to(jnp.asarray(targets, jnp.float32), x.shape)
    loss = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return loss.mean()
