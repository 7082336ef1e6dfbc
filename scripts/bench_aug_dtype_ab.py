"""Same-session A/B of AugmentConfig.aug_dtype on the full vanilla step.

Round 5 tried a uint8 inter-op aug chain (albumentations-faithful
quantization, half the bf16 traffic); the b32 decomposition measured the
u8 chain SLOWER (aug delta 24.7 ms vs r4's bf16 17.7) — but across
sessions. This pins the comparison in ONE session: full vanilla step at
b32 for aug_dtype in (uint8, bfloat16, float32), plus the no-aug floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_aug_dtype_ab.py
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

H, W, BATCH, ITERS = 512, 1024, 32, 20


def main() -> None:
    from rtda_semanticsegmentation_tpu.config import get_preset
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model
    from rtda_semanticsegmentation_tpu.train.optim import build_generator_tx
    from rtda_semanticsegmentation_tpu.train.schedule import poly_lr_schedule
    from rtda_semanticsegmentation_tpu.train.state import ModelState, TrainState
    from rtda_semanticsegmentation_tpu.train.steps import make_train_step

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) b{BATCH}", flush=True)
    cfg = get_preset("bisenet_source_aug")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, gta5_size=(H, W)),
        train=dataclasses.replace(cfg.train, batch_size=BATCH),
    )
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, H, W, 3)),
        build_generator_tx(cfg.optimizer, 1000),
    )
    state0 = TrainState.create(g, None)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 19, (BATCH, H, W), np.int32)),
    }

    def run(tag, **aug_kw):
        c = cfg.replace(augment=dataclasses.replace(cfg.augment, **aug_kw))
        step = jax.jit(
            make_train_step(c, poly_lr_schedule(c.optimizer.learning_rate, 1000), None),
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
        print(f"{tag:18s} {sec * 1e3:8.2f} ms/step ({BATCH / sec:6.1f} img/s)",
              flush=True)
        return sec

    base = run("noaug", pipeline="no_new_aug")
    for dt in ("uint8", "bfloat16", "float32"):
        sec = run(f"aug {dt}", aug_dtype=dt)
        print(f"    -> aug delta {(sec - base) * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
