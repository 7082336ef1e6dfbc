"""Step-time cost of the fg/bg-split Lovász backward (lovasz_interp).

The split backward (r5) fetches four per-bucket tables instead of one in
the radix lookup. This times the flagship (adversarial+Lovász, aug off)
step at b8 with interp on vs off, same session.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_lovasz_interp_cost.py
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, BATCH, ITERS = 512, 1024, 8, 20


def main() -> None:
    from rtda_semanticsegmentation_tpu.config import get_preset
    from rtda_semanticsegmentation_tpu.models.factory import (
        build_discriminator, build_model, init_model,
    )
    from rtda_semanticsegmentation_tpu.train.optim import (
        build_discriminator_tx, build_generator_tx,
    )
    from rtda_semanticsegmentation_tpu.train.schedule import poly_lr_schedule
    from rtda_semanticsegmentation_tpu.train.state import ModelState, TrainState
    from rtda_semanticsegmentation_tpu.train.steps import make_train_step

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) b{BATCH}", flush=True)
    cfg = get_preset("bisenet_adversarial_lovasz")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, gta5_size=(H, W), cityscapes_size=(H, W)
        ),
        train=dataclasses.replace(cfg.train, batch_size=BATCH),
        augment=dataclasses.replace(cfg.augment, pipeline="no_new_aug"),
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
        init_model(disc, jax.random.PRNGKey(1), (1, H, W, 19)),
        build_discriminator_tx(cfg.adversarial, 1000),
    )
    state0 = TrainState.create(g, d)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 19, (BATCH, H, W), np.int32)),
        "target_image": jnp.asarray(
            rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)
        ),
    }
    for interp in (True, False):
        c = cfg.replace(
            loss=dataclasses.replace(cfg.loss, lovasz_interp=interp)
        )
        step = jax.jit(
            make_train_step(
                c,
                poly_lr_schedule(c.optimizer.learning_rate, 1000),
                poly_lr_schedule(c.adversarial.disc_learning_rate, 1000),
            ),
            donate_argnums=0,
        )
        state = jax.tree.map(jnp.copy, state0)
        key = jax.random.PRNGKey(0)
        for _ in range(3):
            state, m = step(state, batch, key)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, batch, key)
        float(m["loss"])
        sec = (time.perf_counter() - t0) / ITERS
        print(f"lovasz_interp={interp}: {sec * 1e3:8.2f} ms/step "
              f"({BATCH / sec:5.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
