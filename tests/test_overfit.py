"""Tiny-dataset overfit tests: every train mode drives mIoU -> ~1.0.

Complement to the one-step torch parity tests (test_train_parity.py): those
prove each step computes the reference's math; these prove the composed
training dynamics *converge* — BiSeNet from scratch memorizes a quadrant-
labeled batch to near-perfect IoU in every mode (vanilla / lovasz /
adversarial / adversarial+lovasz, reference train.py:28,163 and
train_lovasz.py:29,172).

Marked slow: each mode compiles its own step program (~1 min on this
1-core runner, cached afterwards).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.config import get_preset
from rtda_semanticsegmentation_tpu.models.factory import (
    build_discriminator,
    build_model,
    init_model,
)
from rtda_semanticsegmentation_tpu.ops.metrics import (
    confusion_matrix,
    per_class_iou_np,
)
from rtda_semanticsegmentation_tpu.train.optim import (
    build_discriminator_tx,
    build_generator_tx,
)
from rtda_semanticsegmentation_tpu.train.schedule import poly_lr_schedule
from rtda_semanticsegmentation_tpu.train.state import ModelState, TrainState
from rtda_semanticsegmentation_tpu.train.steps import make_train_step

H, W, B = 32, 64, 4
STEPS = 120


def _quadrant_batch(seed=0):
    """Image = label * 60 + noise; label = quadrant id (classes 0..3)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    label = (yy >= H // 2) * 2 + (xx >= W // 2)
    labels = np.broadcast_to(label, (B, H, W)).astype(np.int32)
    images = (
        labels[..., None] * 60 + rng.randint(0, 30, (B, H, W, 3))
    ).astype(np.uint8)
    target = (
        labels[..., None] * 55 + rng.randint(0, 40, (B, H, W, 3))
    ).astype(np.uint8)
    return images, labels, target


def _mode_cfg(mode):
    preset = {
        "vanilla": "bisenet_source_small",
        "lovasz": "bisenet_source_small",
        "adversarial": "bisenet_adversarial",
        "adversarial_lovasz": "bisenet_adversarial_lovasz",
    }[mode]
    cfg = get_preset(preset)
    return cfg.replace(
        model=dataclasses.replace(
            cfg.model, compute_dtype="float32", pretrained_backbone=None
        ),
        augment=dataclasses.replace(cfg.augment, pipeline="no_new_aug"),
        loss=dataclasses.replace(
            cfg.loss, use_lovasz=mode in ("lovasz", "adversarial_lovasz")
        ),
        # overfitting lr: the point is convergence of the machinery, not
        # reference-lr parity (covered by test_train_parity.py)
        optimizer=dataclasses.replace(
            cfg.optimizer, name="sgd", learning_rate=0.02
        ),
        train=dataclasses.replace(cfg.train, batch_size=B),
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "mode", ["vanilla", "lovasz", "adversarial", "adversarial_lovasz"]
)
def test_overfit_to_near_perfect_miou(mode):
    cfg = _mode_cfg(mode)
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, H, W, 3)),
        build_generator_tx(
            cfg.optimizer, STEPS,
            decay_exempt=("supervision1", "supervision2"),
        ),
    )
    d = None
    if cfg.adversarial.enabled:
        disc = build_discriminator(cfg.model)
        d = ModelState.create(
            disc.apply,
            init_model(
                disc, jax.random.PRNGKey(1), (1, H, W, cfg.model.num_classes)
            ),
            build_discriminator_tx(cfg.adversarial, STEPS),
        )
    state = TrainState.create(g, d)
    step = jax.jit(
        make_train_step(
            cfg,
            poly_lr_schedule(cfg.optimizer.learning_rate, STEPS),
            poly_lr_schedule(cfg.adversarial.disc_learning_rate, STEPS),
        ),
        donate_argnums=0,
    )

    images, labels, target = _quadrant_batch()
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}
    if cfg.adversarial.enabled:
        batch["target_image"] = jnp.asarray(target)

    rng = jax.random.PRNGKey(42)
    first_loss = None
    for _ in range(STEPS):
        state, metrics = step(state, batch, rng)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert np.isfinite(last_loss)
    assert last_loss < 0.25 * first_loss, (first_loss, last_loss)

    # Eval-mode predictions on the memorized batch: all 4 present classes
    # near-perfect. (Running BN stats converge over the 120 steps.)
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8

    logits = model.apply(
        state.generator.variables,
        normalize_u8(jnp.asarray(images), cfg.augment),
        False,
    )
    preds = jnp.argmax(logits, -1)
    hist = np.asarray(
        confusion_matrix(jnp.asarray(labels), preds, cfg.model.num_classes)
    )
    ious = per_class_iou_np(hist)
    present = np.unique(labels)
    present_miou = float(ious[present].mean())
    assert present_miou > 0.9, (mode, present_miou, ious[present])
