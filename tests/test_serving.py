"""AOT serving artifacts (serving.py + cli/export.py).

The reference has no deployment path — inference requires the full Python
codebase and a torch checkpoint (``validation.py:25``, ``utils.py:563-645``).
These tests cover the TPU-native serving story: export-once StableHLO
artifacts with baked-in weights, symbolic batch dimensions, multi-platform
lowering (a tpu+cpu artifact must run in CPU CI), int8 PTQ export, and the
predict CLI's ``--artifact`` serving mode.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from rtda_semanticsegmentation_tpu.config import AugmentConfig, ModelConfig
from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model
from rtda_semanticsegmentation_tpu.serving import (
    export_serving,
    load_artifact,
    make_serving_fn,
    save_artifact,
)

H, W = 32, 64


@pytest.fixture(scope="module")
def small_model():
    mcfg = ModelConfig(name="bisenet", context_path="resnet18",
                       compute_dtype="float32")
    model = build_model(mcfg)
    variables = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3),
                           train=False)
    return mcfg, AugmentConfig(), variables


@pytest.fixture(scope="module")
def artifact_dir(small_model, tmp_path_factory):
    """One f32 symbolic-batch tpu+cpu artifact shared across tests."""
    mcfg, acfg, variables = small_model
    blob, meta = export_serving(
        mcfg, acfg, variables, height=H, width=W, batch=None,
        precision="f32", platforms=("tpu", "cpu"),
    )
    path = tmp_path_factory.mktemp("artifacts") / "bisenet_f32"
    save_artifact(str(path), blob, meta)
    return str(path)


def test_artifact_matches_direct_forward(small_model, artifact_dir):
    mcfg, acfg, variables = small_model
    fn, meta = load_artifact(artifact_dir)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (2, H, W, 3), np.uint8)
    got = np.asarray(fn(images))
    want = np.asarray(
        jax.jit(make_serving_fn(mcfg, acfg, variables, "f32"))(images)
    )
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.uint8 and got.shape == (2, H, W)
    assert got.max() < mcfg.num_classes


def test_symbolic_batch_serves_any_batch(artifact_dir):
    fn, meta = load_artifact(artifact_dir)
    assert meta["batch"] is None
    rng = np.random.RandomState(1)
    for b in (1, 3):
        out = np.asarray(fn(rng.randint(0, 256, (b, H, W, 3), np.uint8)))
        assert out.shape == (b, H, W)


def test_meta_contents(artifact_dir):
    with open(os.path.join(artifact_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["model"] == "bisenet"
    assert meta["precision"] == "f32"
    assert meta["quant_clip"] is None  # only recorded for int8 exports
    assert (meta["height"], meta["width"]) == (H, W)
    assert "tpu" in meta["platforms"] and "cpu" in meta["platforms"]


def test_pinned_batch_export(small_model):
    mcfg, acfg, variables = small_model
    blob, meta = export_serving(
        mcfg, acfg, variables, height=H, width=W, batch=2,
        precision="f32", platforms=("cpu",),
    )
    assert meta["batch"] == 2
    from jax import export as jexport

    out = jexport.deserialize(blob).call(
        np.zeros((2, H, W, 3), np.uint8)
    )
    assert np.asarray(out).shape == (2, H, W)


def test_int8_export_requires_calibration(small_model):
    mcfg, acfg, variables = small_model
    with pytest.raises(ValueError, match="calibrate"):
        make_serving_fn(mcfg, acfg, variables, "int8")


def test_int8_artifact_roundtrip(small_model, tmp_path):
    from rtda_semanticsegmentation_tpu.models.quantize import calibrate
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8

    mcfg, acfg, variables = small_model
    rng = np.random.RandomState(2)
    calib = [normalize_u8(
        jnp.asarray(rng.randint(0, 256, (2, H, W, 3), np.uint8)), acfg
    )]
    # CPU tests run the int8 path in f32 container dtype via the quantized
    # model's bf16 default — fidelity is covered by test_quant.py; here we
    # only need the export/runtime plumbing to hold together.
    q_vars = calibrate(mcfg, variables, calib)
    blob, meta = export_serving(
        mcfg, acfg, q_vars, height=H, width=W, batch=1,
        precision="int8", platforms=("cpu",),
    )
    path = tmp_path / "bisenet_int8"
    save_artifact(str(path), blob, meta)
    fn, meta2 = load_artifact(str(path))
    out = np.asarray(fn(rng.randint(0, 256, (1, H, W, 3), np.uint8)))
    assert out.shape == (1, H, W) and out.dtype == np.uint8
    assert meta2["precision"] == "int8"
    # artifacts are pinnable: the activation clip quantile is recorded
    # (r2 advisor: exports silently picked up quant_clip default changes)
    assert meta2["quant_clip"] == mcfg.quant_clip


def test_load_artifact_missing_path(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_artifact(str(tmp_path / "nope"))


def test_export_cli_then_predict_artifact(tmp_path):
    from rtda_semanticsegmentation_tpu.cli.export import main as export_main
    from rtda_semanticsegmentation_tpu.cli.predict import main as predict_main

    art = tmp_path / "artifact"
    rc = export_main([
        "--output", str(art), "--size", str(H), str(W),
        "--precision", "f32", "--platforms", "cpu",
    ])
    assert rc == 0
    assert (art / "model.stablehlo").exists() and (art / "meta.json").exists()

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.RandomState(3)
    for name, size in [("x.png", (50, 30)), ("y.png", (40, 26)),
                       ("z.png", (44, 28))]:
        Image.fromarray(
            rng.randint(0, 256, (size[1], size[0], 3), np.uint8)
        ).save(frames / name)
    out = tmp_path / "masks"
    rc = predict_main([
        "--images", str(frames), "--output", str(out),
        "--artifact", str(art), "--batch_size", "2",
    ])
    assert rc == 0
    for name, size in [("x", (50, 30)), ("y", (40, 26)), ("z", (44, 28))]:
        mask = Image.open(out / f"{name}_trainids.png")
        assert mask.mode == "L" and mask.size == size
        assert np.asarray(mask).max() < 19
