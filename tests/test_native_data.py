"""Native C++ data path (data/_native/fastdata.cpp via data/native.py).

Contract: the native decode+resize is BIT-IDENTICAL to the PIL path it
replaces — decode via the same libpng/libjpeg, bilinear resize replicating
Pillow's fixed-point two-pass resampler, nearest via the same
floor((i+0.5)*scale) convention, and the RGB->trainId LUT matching
``data/labels.py``. If the toolchain is missing the framework silently
falls back to PIL; these tests then skip.
"""

import os

import numpy as np
import pytest
from PIL import Image

from rtda_semanticsegmentation_tpu.data import native
from rtda_semanticsegmentation_tpu.data.labels import (
    IGNORE_INDEX,
    build_color_to_id_lut,
    rgb_label_to_train_ids,
)

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native data path unavailable: {native.unavailable_reason()}",
)


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize(
    "in_size,out_size",
    [((40, 60), (24, 36)), ((24, 36), (48, 72)), ((33, 47), (70, 90)),
     ((64, 64), (64, 64))],
)
def test_image_bilinear_bit_exact_vs_pil(tmp_path, rng, in_size, out_size):
    a = rng.randint(0, 256, in_size + (3,), np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(a).save(p)
    out = native.load_image(p, out_size)
    ref = np.asarray(
        Image.fromarray(a).resize(out_size[::-1], Image.BILINEAR)
    )
    np.testing.assert_array_equal(out, ref)


def test_jpeg_decode_matches_pil(tmp_path, rng):
    a = rng.randint(0, 256, (40, 56, 3), np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(a).save(p, quality=90)
    out = native.load_image(p, (40, 56))
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(out, ref)  # same libjpeg underneath


def test_gray_label_nearest_exact(tmp_path, rng):
    lab = rng.randint(0, 19, (41, 61), np.uint8)
    lab[0, :] = IGNORE_INDEX
    p = str(tmp_path / "lab.png")
    Image.fromarray(lab, mode="L").save(p)
    out = native.load_label(p, (25, 33))
    ref = np.asarray(Image.fromarray(lab).resize((33, 25), Image.NEAREST))
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, ref)


def test_palette_label_returns_raw_indices(tmp_path):
    lab = np.tile(np.arange(16, dtype=np.uint8), (8, 1))
    im = Image.fromarray(lab, mode="P")
    im.putpalette([v for i in range(256) for v in (i, 0, 255 - i)])
    p = str(tmp_path / "pal.png")
    im.save(p)
    out = native.load_label(p, (8, 16))
    np.testing.assert_array_equal(out, lab)


def test_rgb_label_lut_matches_python(tmp_path):
    rgb = np.zeros((20, 30, 3), np.uint8)
    rgb[:10] = [128, 64, 128]   # road -> 0
    rgb[10:] = [107, 142, 35]   # vegetation -> 8
    rgb[:, 0] = [1, 2, 3]       # unknown color -> ignore
    p = str(tmp_path / "rgb.png")
    Image.fromarray(rgb).save(p)
    out = native.load_label(p, (20, 30), rgb_lut=build_color_to_id_lut())
    np.testing.assert_array_equal(out, rgb_label_to_train_ids(rgb))


def test_rgb_label_without_lut_raises(tmp_path):
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(tmp_path / "x.png")
    with pytest.raises(OSError, match="LUT"):
        native.load_label(str(tmp_path / "x.png"), (4, 4))


def test_missing_file_raises():
    with pytest.raises(OSError, match="open"):
        native.load_image("/nonexistent/file.png", (4, 4))


def test_rgba_and_16bit_inputs(tmp_path, rng):
    # RGBA image: alpha is dropped like PIL convert("RGB") on straight alpha
    rgba = rng.randint(0, 256, (12, 14, 4), np.uint8)
    rgba[..., 3] = 255
    p = str(tmp_path / "rgba.png")
    Image.fromarray(rgba, mode="RGBA").save(p)
    out = native.load_image(p, (12, 14))
    np.testing.assert_array_equal(out, rgba[..., :3])
    # 16-bit grayscale LABEL: values don't fit u8 — the native path refuses
    # (rather than silently keeping high bits) so the dataset falls back to
    # PIL, which reads the values verbatim
    lab16 = rng.randint(0, 19, (9, 11)).astype(np.uint16)
    p16 = str(tmp_path / "lab16.png")
    Image.fromarray(lab16).save(p16)
    with pytest.raises(OSError, match="unsupported"):
        native.load_label(p16, (9, 11))


def test_palette_color_label_maps_through_lut(tmp_path):
    """Palette-encoded COLOR labels (the official GTA5 encoding) must map by
    palette color, never by raw palette index."""
    lut = build_color_to_id_lut()
    idx = np.zeros((10, 12), np.uint8)
    idx[5:] = 1
    im = Image.fromarray(idx, mode="P")
    # palette: index 0 -> road color (trainId 0), index 1 -> sky (trainId 10)
    pal = [0] * 768
    pal[0:3] = [128, 64, 128]
    pal[3:6] = [70, 130, 180]
    im.putpalette(pal)
    p = str(tmp_path / "pal_color.png")
    im.save(p)
    out = native.load_label(p, (10, 12), rgb_lut=lut)
    expected = np.where(idx == 0, 0, 10)
    np.testing.assert_array_equal(out, expected)
    # PIL-path equivalence: convert("RGB") -> python LUT
    rgb = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(out, rgb_label_to_train_ids(rgb))


def test_gray_label_with_lut_matches_pil_convert_rgb(tmp_path, rng):
    """On-the-fly mode on a grayscale file: expanded to RGB then LUT-mapped,
    exactly like the PIL path's convert("RGB")."""
    g = rng.randint(0, 256, (8, 9), np.uint8)
    p = str(tmp_path / "gray.png")
    Image.fromarray(g, mode="L").save(p)
    out = native.load_label(p, (8, 9), rgb_lut=build_color_to_id_lut())
    rgb = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(out, rgb_label_to_train_ids(rgb))


def test_dataset_16bit_label_falls_back_to_pil(tmp_path, rng):
    from rtda_semanticsegmentation_tpu.data.datasets import GTA5Dataset

    root = tmp_path / "gta"
    (root / "images").mkdir(parents=True)
    (root / "labels_trainids").mkdir()
    Image.fromarray(
        rng.randint(0, 256, (20, 24, 3), np.uint8)
    ).save(root / "images" / "a.png")
    lab16 = rng.randint(0, 19, (20, 24)).astype(np.uint16)
    Image.fromarray(lab16).save(root / "labels_trainids" / "a.png")
    ds = GTA5Dataset(str(root), size=(20, 24), native_decode="on")
    _, lab = ds.load(0)
    np.testing.assert_array_equal(lab, lab16.astype(np.int32))


def test_dataset_native_equals_pil_path(tmp_path, rng):
    """End-to-end: GTA5Dataset with native on == native off, bit-exact."""
    from rtda_semanticsegmentation_tpu.data.datasets import GTA5Dataset

    root = tmp_path / "gta"
    (root / "images").mkdir(parents=True)
    (root / "labels_trainids").mkdir()
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 256, (50, 70, 3), np.uint8)
        ).save(root / "images" / f"{i:05d}.png")
        Image.fromarray(
            rng.randint(0, 19, (50, 70), np.uint8), mode="L"
        ).save(root / "labels_trainids" / f"{i:05d}.png")

    ds_nat = GTA5Dataset(str(root), size=(32, 48), native_decode="on")
    ds_pil = GTA5Dataset(str(root), size=(32, 48), native_decode="off")
    for i in range(2):
        img_n, lab_n = ds_nat.load(i)
        img_p, lab_p = ds_pil.load(i)
        np.testing.assert_array_equal(img_n, img_p)
        np.testing.assert_array_equal(lab_n, lab_p)


def test_dataset_on_the_fly_rgb_native_equals_pil(tmp_path, rng):
    from rtda_semanticsegmentation_tpu.data.datasets import GTA5Dataset

    root = tmp_path / "gta"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rgb = np.zeros((40, 50, 3), np.uint8)
    rgb[:20] = [128, 64, 128]
    rgb[20:] = [70, 130, 180]
    Image.fromarray(
        rng.randint(0, 256, (40, 50, 3), np.uint8)
    ).save(root / "images" / "a.png")
    Image.fromarray(rgb).save(root / "labels" / "a.png")

    kw = dict(labels_subdir="labels", convert_on_the_fly=True, size=(20, 26))
    ds_nat = GTA5Dataset(str(root), native_decode="on", **kw)
    ds_pil = GTA5Dataset(str(root), native_decode="off", **kw)
    img_n, lab_n = ds_nat.load(0)
    img_p, lab_p = ds_pil.load(0)
    np.testing.assert_array_equal(img_n, img_p)
    np.testing.assert_array_equal(lab_n, lab_p)
