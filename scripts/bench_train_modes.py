"""Measure compiled train-step time for all 4 modes at batch 8 @ 512x1024.

Protocol: donate-arg jitted step, 3 warmup steps, 20 timed steps with one
scalar fetch at the end (the step's own state round-trip keeps iterations
ordered; see PERFORMANCE.md for why block_until_ready isn't trusted).

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_modes.py
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, BATCH = 512, 1024, 8
MODES = (
    "bisenet_source_aug",  # vanilla CE + full aug
    "bisenet_adversarial",  # UDA, CE
    "bisenet_adversarial_lovasz",  # flagship: UDA + CE + Lovasz
)
# Extra rows: --all adds the no-aug source mode (isolates the augmentation
# cost) and DeepLabV2 at its batch 2.


def bench_mode(preset: str, batch: int = BATCH, no_aug: bool = False) -> float:
    from rtda_semanticsegmentation_tpu.config import get_preset
    from rtda_semanticsegmentation_tpu.models.factory import (
        build_discriminator,
        build_model,
        init_model,
    )
    from rtda_semanticsegmentation_tpu.train.optim import (
        build_discriminator_tx,
        build_generator_tx,
    )
    from rtda_semanticsegmentation_tpu.train.schedule import poly_lr_schedule
    from rtda_semanticsegmentation_tpu.train.state import ModelState, TrainState
    from rtda_semanticsegmentation_tpu.train.steps import make_train_step

    cfg = get_preset(preset)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, gta5_size=(H, W), cityscapes_size=(H, W)),
        train=dataclasses.replace(cfg.train, batch_size=batch),
    )
    if no_aug:
        cfg = cfg.replace(
            augment=dataclasses.replace(cfg.augment, pipeline="no_new_aug")
        )
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, H, W, 3)),
        build_generator_tx(cfg.optimizer, 1000),
    )
    d = None
    if cfg.adversarial.enabled:
        disc = build_discriminator(cfg.model)
        d = ModelState.create(
            disc.apply,
            init_model(disc, jax.random.PRNGKey(1), (1, H, W, cfg.model.num_classes)),
            build_discriminator_tx(cfg.adversarial, 1000),
        )
    state = TrainState.create(g, d)
    step = jax.jit(
        make_train_step(
            cfg,
            poly_lr_schedule(cfg.optimizer.learning_rate, 1000),
            poly_lr_schedule(cfg.adversarial.disc_learning_rate, 1000),
        ),
        donate_argnums=0,
    )
    rng = np.random.RandomState(0)
    b = {
        "image": jnp.asarray(rng.randint(0, 256, (batch, H, W, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 19, (batch, H, W), np.int32)),
    }
    if cfg.adversarial.enabled:
        b["target_image"] = jnp.asarray(
            rng.randint(0, 256, (batch, H, W, 3), np.uint8)
        )
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        state, m = step(state, b, key)
    float(m["loss"])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, b, key)
    float(m["loss"])
    return (time.perf_counter() - t0) / n


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rows = [(m, BATCH, False) for m in MODES]
    if "--all" in sys.argv:
        rows += [
            ("bisenet_source_aug", BATCH, True),  # no-aug: isolates aug cost
            ("deeplabv2_cityscapes", 2, True),
        ]
    for preset, batch, no_aug in rows:
        sec = bench_mode(preset, batch, no_aug)
        tag = f"{preset}{' (no aug)' if no_aug else ''} b{batch}"
        print(f"{tag}: {sec * 1e3:.1f} ms/step ({batch / sec:.1f} img/s)")


if __name__ == "__main__":
    main()
