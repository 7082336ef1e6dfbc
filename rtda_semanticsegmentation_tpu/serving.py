"""AOT-compiled serving artifacts (``jax.export`` / StableHLO).

The reference has no deployment story: inference means loading a torch
checkpoint back into the full Python codebase (``validation.py:25``,
``utils.py:563-645``). The TPU-native story is the opposite — compile ONCE,
then run the artifact anywhere with bare jax:

- the whole serving pipeline (uint8 decode-side tensors -> ImageNet
  normalize -> forward -> argmax -> uint8 trainId masks) is a single
  StableHLO program; no flax, no model code, no checkpoint at load time;
- weights are baked into the program as constants (one self-contained file);
- the batch dimension may be *symbolic* so one artifact serves any batch;
- cross-platform lowering: a CPU host can emit a TPU artifact
  (``platforms=("tpu", "cpu")``), so export can run in CI;
- the int8 PTQ path (``models/quantize.py``) exports the same way — the
  calibration stats travel inside the baked constants.

Artifact layout (a directory)::

    <dir>/model.stablehlo   serialized jax.export artifact
    <dir>/meta.json         model / shape / precision metadata

Consumers call :func:`load_artifact` and get back ``(fn, meta)`` where
``fn(images_u8) -> trainId masks``; ``cli/predict.py --artifact`` serves
one directly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence, Tuple

ARTIFACT_GRAPH = "model.stablehlo"
ARTIFACT_META = "meta.json"
_FORMAT_VERSION = 1


def make_serving_fn(model_cfg, augment_cfg, variables, precision: str = "bf16"):
    """The end-to-end serving function ``images_u8 -> trainId masks (uint8)``.

    ``precision``: 'bf16' | 'f32' (plain forward in that compute dtype) or
    'int8' (the PTQ path; ``variables`` must already carry ``quant_stats``
    from :func:`models.quantize.calibrate`). Weights are closed over, so
    tracing/exporting this function bakes them in as constants.
    """
    import jax.numpy as jnp

    from .models.factory import build_model
    from .models.quantize import freeze, quantized_model
    from .ops.augment import normalize_u8

    if precision == "int8":
        if "quant_stats" not in variables:
            raise ValueError(
                "int8 serving needs calibrated variables — run "
                "models.quantize.calibrate() first"
            )
        # serve against frozen weight-space constants (one-time precompute;
        # +3.3% at b128 vs recomputing per forward — PERFORMANCE.md)
        if "quant_frozen" not in variables:
            variables = freeze(model_cfg, variables)
        model = quantized_model(model_cfg, frozen=True)
        dtype = jnp.bfloat16
    elif precision in ("bf16", "f32"):
        dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        model = build_model(
            dataclasses.replace(
                model_cfg, compute_dtype=str(jnp.dtype(dtype)), quant="none"
            )
        )
    else:
        raise ValueError(f"unknown precision {precision!r}")

    def serve(images_u8):
        x = normalize_u8(images_u8, augment_cfg).astype(dtype)
        logits = model.apply(variables, x, False)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    return serve


def export_serving(
    model_cfg,
    augment_cfg,
    variables,
    height: int,
    width: int,
    batch: Optional[int] = None,
    precision: str = "bf16",
    platforms: Optional[Sequence[str]] = None,
) -> Tuple[bytes, dict]:
    """Export the serving function; returns ``(serialized_bytes, meta)``.

    ``batch=None`` exports with a *symbolic* batch dimension (one artifact,
    any batch size); an int pins it. ``platforms`` defaults to
    ``("tpu", "cpu")`` — lowering for both lets the same artifact run on a
    TPU slice and in CPU CI.
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    serve = make_serving_fn(model_cfg, augment_cfg, variables, precision)
    platforms = tuple(platforms or ("tpu", "cpu"))
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        if batch <= 0:
            raise ValueError(f"batch must be positive or None, got {batch}")
        b = batch
    spec = jax.ShapeDtypeStruct((b, height, width, 3), jnp.uint8)
    exported = jexport.export(jax.jit(serve), platforms=list(platforms))(spec)
    meta = {
        "format_version": _FORMAT_VERSION,
        "model": model_cfg.name,
        "context_path": model_cfg.context_path,
        "num_classes": model_cfg.num_classes,
        "precision": precision,
        "quant_clip": (
            model_cfg.quant_clip if precision == "int8" else None
        ),
        "height": height,
        "width": width,
        "batch": batch,  # null => symbolic
        "platforms": list(platforms),
        "input": "uint8 NHWC RGB images, any size pre-resized to (height, width)",
        "output": "uint8 NHW trainId masks (argmax over classes)",
        "jax_version": jax.__version__,
    }
    return exported.serialize(), meta


def save_artifact(path: str, blob: bytes, meta: dict) -> None:
    """Write ``<path>/model.stablehlo`` + ``<path>/meta.json``."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ARTIFACT_GRAPH), "wb") as f:
        f.write(blob)
    with open(os.path.join(path, ARTIFACT_META), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


def load_artifact(path: str):
    """Load an exported artifact; returns ``(fn, meta)``.

    ``fn(images_u8)`` accepts a numpy/jax uint8 (B, H, W, 3) array — B free
    if the artifact was exported with a symbolic batch — and returns the
    uint8 trainId masks. Needs only jax (no model code or checkpoints).
    """
    from jax import export as jexport

    graph = os.path.join(path, ARTIFACT_GRAPH)
    meta_path = os.path.join(path, ARTIFACT_META)
    if not os.path.isfile(graph):
        raise FileNotFoundError(f"no serving artifact at {path!r} ({graph} missing)")
    with open(graph, "rb") as f:
        exported = jexport.deserialize(f.read())
    meta = {}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return exported.call, meta
