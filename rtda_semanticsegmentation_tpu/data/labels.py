"""Label semantics for GTA5 -> Cityscapes domain adaptation.

19 Cityscapes-trainId-aligned classes with GTA5 RGB label colors and the
256^3 RGB->trainId lookup table. Behavioral parity with the reference's
``datasets/label_definitions.py:6-67`` (class list, colors, ignore_id=255)
and ``datasets/preprocess_gta5_labels.py:12-25`` (LUT construction and
fancy-indexed conversion), re-expressed as plain numpy data (no torch).
"""

from __future__ import annotations

import numpy as np

NUM_CLASSES = 19
IGNORE_INDEX = 255

# (name, trainId, RGB color) — order defines trainIds 0..18.
_DEFS = (
    ("road", 0, (128, 64, 128)),
    ("sidewalk", 1, (244, 35, 232)),
    ("building", 2, (70, 70, 70)),
    ("wall", 3, (102, 102, 156)),
    ("fence", 4, (190, 153, 153)),
    ("pole", 5, (153, 153, 153)),
    ("traffic light", 6, (250, 170, 30)),
    ("traffic sign", 7, (220, 220, 0)),
    ("vegetation", 8, (107, 142, 35)),
    ("terrain", 9, (152, 251, 152)),
    ("sky", 10, (70, 130, 180)),
    ("person", 11, (220, 20, 60)),
    ("rider", 12, (255, 0, 0)),
    ("car", 13, (0, 0, 142)),
    ("truck", 14, (0, 0, 70)),
    ("bus", 15, (0, 60, 100)),
    ("train", 16, (0, 80, 100)),
    ("motorcycle", 17, (0, 0, 230)),
    ("bicycle", 18, (119, 11, 32)),
)

GTA5_CLASS_NAMES: tuple = tuple(d[0] for d in _DEFS)
GTA5_CLASS_COLORS: tuple = tuple(d[2] for d in _DEFS)

# Cityscapes trainId -> RGB for visualization (reference data_loader.py:231-252)
# — identical palette to the GTA5 colors, by construction of trainIds.
CITYSCAPES_TRAINID_COLORS = GTA5_CLASS_COLORS

# trainId -> readable name incl. the ignore id (reference data_loader.py:255-276).
CITYSCAPES_ID_TO_NAME = {d[1]: d[0] for d in _DEFS}
CITYSCAPES_ID_TO_NAME[IGNORE_INDEX] = "ignore"

_LUT_CACHE: np.ndarray | None = None


def build_color_to_id_lut() -> np.ndarray:
    """Build (and cache) the 256x256x256 uint8 RGB->trainId LUT.

    Initialized to IGNORE_INDEX; the 19 class colors map to their trainIds
    (parity: reference ``preprocess_gta5_labels.py:12-15`` and
    ``gta5.py:20-32``).
    """
    global _LUT_CACHE
    if _LUT_CACHE is None:
        lut = np.full((256, 256, 256), IGNORE_INDEX, dtype=np.uint8)
        for _, cid, (r, g, b) in _DEFS:
            lut[r, g, b] = cid
        _LUT_CACHE = lut
    return _LUT_CACHE


def rgb_label_to_train_ids(label_rgb: np.ndarray) -> np.ndarray:
    """Convert an (H, W, 3) uint8 RGB label image to (H, W) uint8 trainIds.

    Unknown colors map to IGNORE_INDEX (parity: reference
    ``preprocess_gta5_labels.py:18-25``)."""
    if label_rgb.ndim != 3 or label_rgb.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) RGB label, got {label_rgb.shape}")
    lut = build_color_to_id_lut()
    return lut[label_rgb[..., 0], label_rgb[..., 1], label_rgb[..., 2]]


def train_ids_to_rgb(train_ids: np.ndarray) -> np.ndarray:
    """Colorize an (H, W) trainId map to (H, W, 3) uint8 RGB for viz.

    Ignore/unknown ids render black (parity: reference
    ``data_loader.py:279-319`` ``tensor_to_rgb``)."""
    palette = np.zeros((256, 3), dtype=np.uint8)
    for _, cid, color in _DEFS:
        palette[cid] = color
    return palette[train_ids.astype(np.int64)]
