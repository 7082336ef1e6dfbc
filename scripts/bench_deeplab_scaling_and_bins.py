"""DeepLabV2 train-step batch/remat scaling + flagship Lovasz bins sweep.

Two open questions from PERFORMANCE.md:

1. DeepLabV2 training was only measured at the reference batch size (2).
   Does batching (and remat, if HBM-bound) improve img/s on v5e?
2. The binned Lovasz defaults to 1024 bins (~1e-3 of exact). The radix
   histogram cost scales with k1+k2 = 2*sqrt(bins) compares/pixel — how much
   flagship step time does 512/256 bins buy back, for how much approximation?

Protocol: donate-arg jitted step, 3 warmup, 20 timed, one scalar fetch
(PERFORMANCE.md ring/compiled-loop rules; the state round-trip orders steps).

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_deeplab_scaling_and_bins.py
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 1024


def bench(preset: str, batch: int, remat: bool = False, bins: int | None = None):
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
        train=dataclasses.replace(cfg.train, batch_size=batch, remat=remat),
        augment=dataclasses.replace(cfg.augment, pipeline="no_new_aug"),
    )
    if bins is not None:
        cfg = cfg.replace(loss=dataclasses.replace(cfg.loss, lovasz_bins=bins))
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


def row(tag, preset, batch, remat=False, bins=None):
    try:
        sec = bench(preset, batch, remat, bins)
        print(f"{tag}: {sec * 1e3:.1f} ms/step ({batch / sec:.1f} img/s)", flush=True)
    except Exception as e:  # OOM rows are data too
        print(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    for batch in (2, 4, 8):
        row(f"deeplabv2 b{batch}", "deeplabv2_cityscapes", batch)
    row("deeplabv2 b8 remat", "deeplabv2_cityscapes", 8, remat=True)
    row("deeplabv2 b16 remat", "deeplabv2_cityscapes", 16, remat=True)
    for bins in (1024, 512, 256):
        row(
            f"flagship b8 bins={bins}",
            "bisenet_adversarial_lovasz",
            8,
            bins=bins,
        )


if __name__ == "__main__":
    main()
