"""Predict CLI: batch inference -> trainId/color/overlay PNGs.

The reference has no prediction tool (inference lives only inside
``validation.py`` and the W&B gallery); this covers the serving CLI: input
collection, batching with a padded tail, both precisions, resize-back
semantics, and weights-only checkpoint restore.
"""

import os

import numpy as np
import pytest
from PIL import Image

from rtda_semanticsegmentation_tpu.cli.predict import collect_images
from rtda_semanticsegmentation_tpu.cli.predict import main as predict_main


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.RandomState(0)
    d = tmp_path / "frames"
    d.mkdir()
    # varying input sizes to exercise resize-back (W, H)
    for name, size in [("a.png", (60, 40)), ("b.png", (48, 32)),
                       ("c.jpg", (64, 48))]:
        Image.fromarray(
            rng.randint(0, 256, (size[1], size[0], 3), np.uint8)
        ).save(d / name)
    (d / "notes.txt").write_text("not an image")
    return d


def test_collect_images_orders_and_filters(image_dir):
    paths = collect_images(str(image_dir))
    assert [os.path.basename(p) for p in paths] == ["a.png", "b.png", "c.jpg"]
    single = collect_images(str(image_dir / "a.png"))
    assert len(single) == 1
    with pytest.raises(FileNotFoundError):
        collect_images(str(image_dir / "*.webp"))


def test_predict_writes_masks_at_input_size(image_dir, tmp_path):
    out = tmp_path / "masks"
    rc = predict_main([
        "--images", str(image_dir), "--output", str(out),
        "--size", "32", "64", "--batch_size", "2", "--precision", "f32",
    ])
    assert rc == 0
    for name, size in [("a", (60, 40)), ("b", (48, 32)), ("c", (64, 48))]:
        mask = Image.open(out / f"{name}_trainids.png")
        assert mask.mode == "L" and mask.size == size
        ids = np.asarray(mask)
        assert ids.max() < 19  # predictions never emit the ignore id
        color = Image.open(out / f"{name}_color.png")
        assert color.size == size and color.mode == "RGB"
    assert not (out / "notes_trainids.png").exists()


def test_predict_int8_overlay_model_size(image_dir, tmp_path):
    out = tmp_path / "masks_q"
    rc = predict_main([
        "--images", str(image_dir), "--output", str(out),
        "--size", "32", "64", "--batch_size", "2", "--precision", "int8",
        "--calib_batches", "1", "--overlay", "--no_resize_back",
    ])
    assert rc == 0
    for name in ("a", "b", "c"):
        assert Image.open(out / f"{name}_trainids.png").size == (64, 32)
        assert Image.open(out / f"{name}_overlay.png").size == (64, 32)


def test_predict_restores_trained_checkpoint(image_dir, tmp_path):
    from rtda_semanticsegmentation_tpu.cli.train import main as train_main

    ckpt = tmp_path / "ckpt"
    train_main([
        "--preset", "bisenet_source_small",
        "--train_dataset", "synthetic", "--val_dataset", "synthetic",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "4",
        "--mesh_data", "4", "--compute_dtype", "float32",
        "--checkpoint_dir", str(ckpt), "--run_name", "predict_smoke",
        "--log_backend", "null", "--no_perf", "--eval_batch_size", "4",
        "--train_size", "64", "128", "--eval_size", "64", "128",
    ])
    out = tmp_path / "masks_ckpt"
    rc = predict_main([
        "--images", str(image_dir / "a.png"), "--output", str(out),
        "--size", "64", "128", "--batch_size", "1", "--precision", "f32",
        "--checkpoint_dir", str(ckpt), "--run_name", "predict_smoke",
        "--restore", "best",
    ])
    assert rc == 0
    assert (out / "a_trainids.png").exists()


def test_predict_same_stem_inputs_do_not_clobber(tmp_path):
    rng = np.random.RandomState(1)
    d = tmp_path / "frames"
    d.mkdir()
    Image.fromarray(rng.randint(0, 256, (16, 20, 3), np.uint8)).save(d / "a.png")
    Image.fromarray(rng.randint(0, 256, (16, 20, 3), np.uint8)).save(d / "a.jpg")
    out = tmp_path / "masks"
    predict_main([
        "--images", str(d), "--output", str(out),
        "--size", "32", "64", "--batch_size", "2", "--precision", "f32",
    ])
    names = sorted(os.listdir(out))
    # two distinct trainId masks: a + a_1
    assert "a_trainids.png" in names and "a_1_trainids.png" in names


def test_predict_missing_checkpoint_raises(image_dir, tmp_path):
    with pytest.raises(FileNotFoundError):
        predict_main([
            "--images", str(image_dir), "--output", str(tmp_path / "o"),
            "--size", "32", "64", "--precision", "f32",
            "--checkpoint_dir", str(tmp_path / "nope"),
        ])
