"""Observability tests: jsonl logger event stream, validation metric keys
(the reference's W&B key surface), image panel output, null backend."""

import dataclasses
import json
import os

import numpy as np

from rtda_semanticsegmentation_tpu.config import ExperimentConfig
from rtda_semanticsegmentation_tpu.obs import make_logger


def cfg_with(tmp_path, backend="jsonl"):
    cfg = ExperimentConfig()
    return cfg.replace(
        obs=dataclasses.replace(cfg.obs, backend=backend, log_dir=str(tmp_path))
    )


def read_events(tmp_path, run):
    with open(os.path.join(tmp_path, f"{run}.jsonl")) as fh:
        return [json.loads(line) for line in fh]


def test_jsonl_stream_and_run_config(tmp_path):
    logger = make_logger(cfg_with(tmp_path), "r1")
    logger.log({"train/loss": 1.5, "train/lr": 1e-4}, step=7)
    logger.summary({"best_miou": 0.5})
    logger.finish()
    events = read_events(tmp_path, "r1")
    assert events[0]["event"] == "run_config"
    # reference run-config knob surface (utils.py:127-172)
    for key in ("model_name", "optimizer", "learning_rate",
                "augmentation_pipeline", "use_lovasz", "train_mode"):
        assert key in events[0], key
    metric = next(e for e in events if e["event"] == "metrics")
    assert metric["step"] == 7 and metric["train/loss"] == 1.5
    assert any(e["event"] == "summary" and e["best_miou"] == 0.5 for e in events)


def test_validation_keys_match_reference_surface(tmp_path):
    logger = make_logger(cfg_with(tmp_path), "r2")
    ious = np.linspace(0, 1, 19)
    logger.log_validation(0.42, 1.1, ious, step=100)
    logger.finish()
    events = read_events(tmp_path, "r2")
    m = next(e for e in events if e["event"] == "metrics")
    # reference validation.py:145-154 key layout
    assert m["val/mIoU"] == 0.42 and m["val/epoch_loss"] == 1.1
    assert "val_iou_per_class/iou_road" in m
    assert "val_iou_per_class/iou_traffic_light" in m
    assert abs(m["val_iou_per_class/iou_bicycle"] - 1.0) < 1e-9


def test_segmentation_image_panel(tmp_path):
    logger = make_logger(cfg_with(tmp_path), "r3")
    img = np.random.RandomState(0).randint(0, 256, (16, 24, 3), np.uint8)
    label = np.random.RandomState(1).randint(0, 19, (16, 24))
    pred = np.random.RandomState(2).randint(0, 19, (16, 24))
    logger.log_segmentation_images(img, label, pred, step=5)
    logger.finish()
    events = read_events(tmp_path, "r3")
    imev = next(e for e in events if e["event"] == "image")
    assert os.path.exists(imev["path"])
    from PIL import Image

    assert np.asarray(Image.open(imev["path"])).shape == (16, 72, 3)


def test_null_backend_is_silent(tmp_path):
    logger = make_logger(cfg_with(tmp_path, backend="null"), "r4")
    logger.log({"x": 1.0}, 0)
    logger.log_validation(0.1, 0.2, np.zeros(19), 1)
    logger.summary({"y": 2})
    logger.finish()
    assert not os.path.exists(os.path.join(tmp_path, "r4.jsonl"))
