"""Flagship adversarial+Lovasz step vs `adversarial.disc_downsample`.

The FC-Discriminator is ~1/3 of the flagship step in isolation and its
19-channel full-resolution conv1 resists every kernel-level rewrite tried
(PERFORMANCE.md "Known anomalies"). `disc_downsample` block-averages the
generator LOGITS before the softmax that feeds D (both the D update and
G's adversarial term), shrinking D's pixel work by factor^2 and skipping
the full-res f32 probability-map materialization, while keeping the same
patch-level output-space domain signal (factor 1 = reference parity,
train.py:249-307). This measures the end-to-end step time at factors
1/2/4/8 with the bench_train_modes protocol (donated jitted step, 3 warmup,
20 timed, one scalar fetch).

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_disc_downsample.py
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, BATCH = 512, 1024, 8
FACTORS = (1, 2, 4, 8)


def bench_factor(factor: int) -> float:
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

    cfg = get_preset("bisenet_adversarial_lovasz")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, gta5_size=(H, W), cityscapes_size=(H, W)
        ),
        train=dataclasses.replace(cfg.train, batch_size=BATCH),
        adversarial=dataclasses.replace(
            cfg.adversarial, disc_downsample=factor
        ),
    )
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, H, W, 3)),
        build_generator_tx(cfg.optimizer, 1000),
    )
    disc = build_discriminator(cfg.model)
    d = ModelState.create(
        disc.apply,
        init_model(
            disc,
            jax.random.PRNGKey(1),
            (1, H // factor, W // factor, cfg.model.num_classes),
        ),
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
        "image": jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 19, (BATCH, H, W), np.int32)),
        "target_image": jnp.asarray(
            rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)
        ),
    }
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
    base = None
    for f in FACTORS:
        sec = bench_factor(f)
        base = base or sec
        print(
            f"disc_downsample={f}: {sec * 1e3:.1f} ms/step "
            f"({BATCH / sec:.1f} img/s, {base / sec:.2f}x vs factor 1)"
        )


if __name__ == "__main__":
    main()
