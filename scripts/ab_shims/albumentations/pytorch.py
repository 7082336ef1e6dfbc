"""ToTensorV2 shim — see package docstring."""

import numpy as np
import torch

from . import _Transform


class ToTensorV2(_Transform):
    def __call__(self, image, mask):
        img = torch.from_numpy(np.ascontiguousarray(image.transpose(2, 0, 1)))
        msk = torch.from_numpy(np.ascontiguousarray(mask))
        return img, msk
