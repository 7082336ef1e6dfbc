"""Label definitions and RGB<->trainId LUT parity."""

import numpy as np

from rtda_semanticsegmentation_tpu.data.labels import (
    CITYSCAPES_ID_TO_NAME,
    GTA5_CLASS_COLORS,
    GTA5_CLASS_NAMES,
    IGNORE_INDEX,
    NUM_CLASSES,
    build_color_to_id_lut,
    rgb_label_to_train_ids,
    train_ids_to_rgb,
)


def test_class_inventory():
    assert NUM_CLASSES == 19
    assert IGNORE_INDEX == 255
    assert len(GTA5_CLASS_NAMES) == 19
    assert GTA5_CLASS_NAMES[0] == "road"
    assert GTA5_CLASS_NAMES[18] == "bicycle"
    assert GTA5_CLASS_COLORS[0] == (128, 64, 128)
    assert GTA5_CLASS_COLORS[13] == (0, 0, 142)  # car
    assert CITYSCAPES_ID_TO_NAME[255] == "ignore"
    assert CITYSCAPES_ID_TO_NAME[6] == "traffic light"


def test_lut_roundtrip_all_classes():
    lut = build_color_to_id_lut()
    assert lut.shape == (256, 256, 256) and lut.dtype == np.uint8
    for cid, (r, g, b) in enumerate(GTA5_CLASS_COLORS):
        assert lut[r, g, b] == cid
    # an arbitrary non-class color maps to ignore
    assert lut[1, 2, 3] == IGNORE_INDEX


def test_rgb_label_to_train_ids():
    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 0] = (128, 64, 128)  # road
    img[0, 1] = (220, 20, 60)  # person
    img[1, 2] = (12, 34, 56)  # unknown -> ignore
    ids = rgb_label_to_train_ids(img)
    assert ids[0, 0] == 0 and ids[0, 1] == 11 and ids[1, 2] == IGNORE_INDEX


def test_colorize_roundtrip():
    ids = np.array([[0, 11], [18, 255]], np.uint8)
    rgb = train_ids_to_rgb(ids)
    assert tuple(rgb[0, 0]) == (128, 64, 128)
    assert tuple(rgb[0, 1]) == (220, 20, 60)
    assert tuple(rgb[1, 0]) == (119, 11, 32)
    assert tuple(rgb[1, 1]) == (0, 0, 0)  # ignore renders black
