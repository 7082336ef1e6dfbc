from .metrics import confusion_matrix, per_class_iou, mean_iou
from .losses import (
    bce_with_logits,
    cross_entropy_with_ignore,
    lovasz_softmax,
    lovasz_softmax_binned,
)
from .augment import augment_batch, normalize, normalize_u8

__all__ = [
    "confusion_matrix",
    "per_class_iou",
    "mean_iou",
    "bce_with_logits",
    "cross_entropy_with_ignore",
    "lovasz_softmax",
    "lovasz_softmax_binned",
    "augment_batch",
    "normalize",
    "normalize_u8",
]
