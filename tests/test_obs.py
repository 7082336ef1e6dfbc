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


def test_flop_count_table_matches_analytic_convs():
    """Per-module FLOP table (fvcore flop_count_table analog,
    reference utils.py:328-340): spot-check the ResNet stem row — MACs =
    out_H*out_W*kh*kw*cin*cout — and that the total aggregates children."""
    import jax

    from rtda_semanticsegmentation_tpu.config import ModelConfig
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model
    from rtda_semanticsegmentation_tpu.obs import flop_count_table

    cfg = ModelConfig(compute_dtype="float32")
    m = build_model(cfg)
    v = init_model(m, jax.random.PRNGKey(0), (1, 64, 128, 3), train=False)
    table = flop_count_table(m, v, (1, 64, 128, 3), depth=3)
    lines = {ln.split("|")[0].strip(): ln for ln in table.splitlines()}
    # stem conv: 7x7x3->64, stride 2 on 64x128 -> 32x64 outputs
    want_g = 32 * 64 * 7 * 7 * 3 * 64 / 1e9
    assert f"{want_g:.3f}G" in lines["stem"]
    # model total row exists and exceeds the trunk's
    assert "model" in lines and "context_path" in lines


class _FakeWandbRun:
    def __init__(self):
        self.logged = []
        self.summary = {}
        self.finished = False

    def log(self, metrics, step=None):
        self.logged.append((step, metrics))

    def finish(self):
        self.finished = True


class _FakeWandb:
    """Captures the W&B SDK call surface (the real SDK isn't installed;
    VERDICT r1 task 8: the wandb branch of obs/logging.py had never
    executed). Mirrors the subset of the API the reference uses
    (utils.py:120-207, 210-288, 404-410)."""

    class Image:
        def __init__(self, data, masks=None):
            self.data = np.asarray(data)
            self.masks = masks

    def __init__(self):
        self.init_kwargs = None
        self.saves = []
        self.run = _FakeWandbRun()

    def init(self, **kwargs):
        self.init_kwargs = kwargs
        return self.run

    def save(self, glob_str, base_path=None, policy=None):
        self.saves.append((glob_str, base_path, policy))


def _with_fake_wandb(monkeypatch):
    import sys

    fake = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    return fake


def test_wandb_backend_full_surface(tmp_path, monkeypatch):
    """Drives the REAL wandb branch of MetricLogger against a fake SDK:
    init kwargs, step-keyed scalars, mask images, checkpoint save glob,
    summary, finish."""
    fake = _with_fake_wandb(monkeypatch)
    logger = make_logger(cfg_with(tmp_path, backend="wandb"), "wrun")

    # init: project/entity/name/config assembled like utils.py:120-207
    assert fake.init_kwargs["project"] == "RTDA-SemSeg"
    assert fake.init_kwargs["name"] == "wrun"
    conf = fake.init_kwargs["config"]
    assert conf["model_name"] == "bisenet"
    assert {"optimizer", "learning_rate", "augmentation_pipeline",
            "use_lovasz", "seed"} <= set(conf)

    logger.log({"train/loss": 1.25}, step=3)
    assert fake.run.logged[-1] == (3, {"train/loss": 1.25})

    img = np.zeros((8, 8, 3), np.uint8)
    label = np.zeros((8, 8), np.int32)
    pred = np.ones((8, 8), np.int32)
    logger.log_segmentation_images(img, label, pred, step=4, tag="val/pred")
    step, payload = fake.run.logged[-1]
    assert step == 4
    wimg = payload["val/pred"]
    assert isinstance(wimg, _FakeWandb.Image)
    # reference's mask layout: ground_truth + prediction with class labels
    assert set(wimg.masks) == {"ground_truth", "prediction"}
    assert wimg.masks["prediction"]["class_labels"][0] == "road"
    np.testing.assert_array_equal(
        wimg.masks["ground_truth"]["mask_data"], label
    )

    ckpt_dir = tmp_path / "ckpt" / "best"
    ckpt_dir.mkdir(parents=True)
    (ckpt_dir / "x.bin").write_bytes(b"d")
    logger.save_dir(str(ckpt_dir))
    glob_str, base, policy = fake.saves[-1]
    assert glob_str.endswith(os.path.join("best", "**"))
    assert policy == "live"  # reference utils.py:404-410

    logger.summary({"best_miou": 0.47})
    assert fake.run.summary["best_miou"] == 0.47
    logger.finish()
    assert fake.run.finished


def test_wandb_init_failure_degrades_to_jsonl(tmp_path, monkeypatch):
    """Reference parity: W&B failures degrade the run, never kill it
    (utils.py:206-207)."""
    import sys

    class _Broken:
        def init(self, **kwargs):
            raise RuntimeError("no network")

    monkeypatch.setitem(sys.modules, "wandb", _Broken())
    logger = make_logger(cfg_with(tmp_path, backend="wandb"), "wfall")
    logger.log({"train/loss": 2.0}, step=1)
    logger.finish()
    events = read_events(tmp_path, "wfall")
    assert any(e.get("event") == "metrics" for e in events)
