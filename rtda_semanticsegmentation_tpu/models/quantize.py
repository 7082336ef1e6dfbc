"""int8 PTQ calibration + quantized-model construction (serving path).

The reference has no quantized serving mode; this is a TPU-native addition
layered on the trained checkpoints (scheme in ``ops/quant.py``). Usage:

    variables = calibrate(cfg.model, variables, calib_batches)   # once
    model_q = quantized_model(cfg.model)                         # quant='int8'
    logits = model_q.apply(variables, images, False)             # s8 MXU path

``calibrate`` records a per-conv, per-INPUT-CHANNEL clip statistic (ci,)
into a ``quant_stats`` flax collection: exact per-channel max|x| when
``ModelConfig.quant_clip >= 1.0``, else the ``quant_clip``-quantile of |x|
per channel per calibration batch (``ops/quant.py::calib_clip_channels``).
Batches merge by **max of the per-batch quantiles** — a deliberately
conservative upper estimate of the pooled-set quantile (cheap,
order-independent, and errs toward a wider int8 range rather than extra
saturation). The quantized apply reads those stats and needs no other state
— weights quantize on the fly from the same f32 params the bf16 path uses
(channel-folded, see ``ops/quant.py``), so checkpoints are format-identical.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable

import jax.numpy as jnp

from ..config import ModelConfig
from .factory import build_model


def calibrate(
    model_cfg: ModelConfig, variables: dict, batches: Iterable
) -> dict:
    """Run calibration forwards; returns ``variables`` + ``quant_stats``.

    ``batches`` yields normalized float images (B, H, W, 3) — the same
    tensors the bf16 forward consumes (use ``ops.augment.normalize_u8`` on
    loader output). A handful of batches suffices for max-abs calibration.
    """
    if model_cfg.quant not in ("none", "calib", "int8"):
        raise ValueError(f"unknown quant mode {model_cfg.quant!r}")
    model_c = build_model(dataclasses.replace(model_cfg, quant="calib"))
    n = 0
    for images in batches:
        _, muts = model_c.apply(
            variables,
            jnp.asarray(images),
            False,
            mutable=["quant_stats"],
        )
        variables = {**variables, "quant_stats": muts["quant_stats"]}
        n += 1
    if n == 0:
        raise ValueError("calibrate() needs at least one batch")
    return variables


def freeze(
    model_cfg: ModelConfig,
    variables: dict,
    input_shape: tuple = (1, 64, 128, 3),
) -> dict:
    """Precompute the int8 serving constants from calibrated ``variables``.

    Returns ``variables`` + a ``quant_frozen`` collection (per-conv s8
    kernel, dequant scale, combined zero-point/bias-correction constant —
    ``ops/quant.py::freeze_weights``). The weight-space work ``int8``-mode
    apply would redo every forward (batch-independent, ~17% of b128 int8
    serving time, BENCH r4) runs exactly once here. Serve with
    ``quantized_model(cfg, frozen=True)``.

    ``input_shape`` drives one tiny tracing forward — the frozen constants
    depend only on params and calibrated stats, never on the input values
    or resolution. The default assumes the model zoo's 3-channel RGB input
    and a spatial size divisible by every model stride (64x128 covers
    both families); pass a matching shape for any variant that differs.
    """
    if "quant_stats" not in variables:
        raise ValueError("freeze() needs calibrated variables (quant_stats)")
    model_f = build_model(dataclasses.replace(model_cfg, quant="freeze"))
    _, muts = model_f.apply(
        variables,
        jnp.zeros(input_shape, jnp.bfloat16),
        False,
        mutable=["quant_frozen"],
    )
    return {**variables, "quant_frozen": muts["quant_frozen"]}


def quantized_model(model_cfg: ModelConfig, frozen: bool = False):
    """The generator module with its quantized convs on the int8 path.

    ``frozen=True`` serves against the precomputed :func:`freeze`
    constants (identical arithmetic, faster); the variables must carry the
    ``quant_frozen`` collection.
    """
    quant = "int8_frozen" if frozen else "int8"
    return build_model(dataclasses.replace(model_cfg, quant=quant))
