from .metrics import confusion_matrix, per_class_iou, mean_iou
from .losses import (
    cross_entropy_with_ignore,
    lovasz_softmax,
    bce_with_logits,
)
