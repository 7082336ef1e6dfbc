"""Minimal albumentations shim for the reference A/B harness.

The real albumentations is not installed in this environment; the reference
imports it at module scope (``/root/reference/config.py:3-5``) and constructs
all seven pipelines at import time (``config.py:128-241``). The epoch-scale
A/B (``scripts/ab_reference.py``) pins the deterministic ``no_new_aug``
pipeline (Resize -> Normalize -> ToTensorV2), so only those three transforms
need faithful semantics; the stochastic augmentations (HorizontalFlip,
ColorJitter, ISONoise, CoarseDropout) must *construct* with the reference's
kwargs but raise if actually applied — applying them would silently desync
the A/B (different RNG streams than our on-device pipeline).

Faithful semantics implemented:

- ``Resize(height, width)``: identity when the input already matches (the
  A/B writes fixtures at the target size exactly so no resampler-parity
  question arises); otherwise PIL bilinear for images / nearest for masks
  (albumentations uses cv2 bilinear — documented deviation, unused by the
  A/B).
- ``Normalize(mean, std)``: ``(img - mean*255) / (std*255)`` as float32,
  albumentations' ``max_pixel_value=255.0`` default.
- ``ToTensorV2``: image HWC -> torch CHW (dtype preserved), mask ->
  ``torch.from_numpy`` (dtype preserved; the reference casts ``.long()`` in
  its train/val loops, ``train.py:89``).
"""

import numpy as np


class _Transform:
    def __init__(self, p=1.0, **kwargs):
        self.p = p
        self._kwargs = kwargs

    def __call__(self, image, mask):
        raise NotImplementedError(
            f"{type(self).__name__} shim cannot be applied — the A/B "
            "harness must pin the no_new_aug pipeline"
        )


class Resize(_Transform):
    def __init__(self, height, width, p=1.0, **kwargs):
        super().__init__(p=p, **kwargs)
        self.height, self.width = int(height), int(width)

    def __call__(self, image, mask):
        if image.shape[:2] == (self.height, self.width):
            return image, mask
        from PIL import Image as PILImage

        img = PILImage.fromarray(image).resize(
            (self.width, self.height), PILImage.BILINEAR
        )
        msk = PILImage.fromarray(mask).resize(
            (self.width, self.height), PILImage.NEAREST
        )
        return np.asarray(img), np.asarray(msk)


class Normalize(_Transform):
    def __init__(self, mean, std, max_pixel_value=255.0, p=1.0, **kwargs):
        super().__init__(p=p, **kwargs)
        self.mean = np.asarray(mean, np.float32) * max_pixel_value
        self.std = np.asarray(std, np.float32) * max_pixel_value

    def __call__(self, image, mask):
        img = (image.astype(np.float32) - self.mean) / self.std
        return img, mask


class HorizontalFlip(_Transform):
    pass


class ColorJitter(_Transform):
    def __init__(self, brightness=0.2, contrast=0.2, saturation=0.2,
                 hue=0.2, p=0.5, **kwargs):
        super().__init__(p=p, **kwargs)


class ISONoise(_Transform):
    def __init__(self, intensity=(0.1, 0.5), color_shift=(0.01, 0.05),
                 p=0.5, **kwargs):
        super().__init__(p=p, **kwargs)


class CoarseDropout(_Transform):
    def __init__(self, num_holes_range=(1, 1), hole_height_range=(8, 8),
                 hole_width_range=(8, 8), fill=0, p=0.5, **kwargs):
        super().__init__(p=p, **kwargs)


class Compose:
    """Applies transforms in order; iterable (the reference prints
    ``list(map(lambda x: x.__class__.__name__, transforms))``,
    ``main.py:205``)."""

    def __init__(self, transforms, **kwargs):
        self.transforms = list(transforms)

    def __iter__(self):
        return iter(self.transforms)

    def __call__(self, image, mask):
        for t in self.transforms:
            image, mask = t(image, mask)
        return {"image": image, "mask": mask}
