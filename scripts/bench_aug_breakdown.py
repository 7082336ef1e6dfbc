"""Per-sub-op augmentation cost: vanilla train step under each pipeline.

The full pipeline costs 4.6 ms/step at b8 @ 512x1024 (32.8 with
`all_four_combined` vs 28.2 with `no_new_aug`, bench_train_modes --all).
This decomposes that by running the SAME vanilla BiSeNet train step under
each single-op pipeline — the step-level A/B protocol is the only reliable
way to cost sub-ms ops on this stack (PERFORMANCE.md item 9). Informs
whether the ColorJitter switch/cond structure (vmapped lax.switch runs
every branch) is worth restructuring.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_aug_breakdown.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 1024
BATCH = int(os.environ.get("AUG_BATCH", "8"))
PIPELINES = (
    "no_new_aug",
    "hflip_only",
    "colorjitter_only",
    "isonoise_only",
    "coarsedropout_only",
    "all_four_combined",
    "all_four_plus_hflip",
)


def bench_pipeline(pipeline: str) -> float:
    from rtda_semanticsegmentation_tpu.config import get_preset
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model
    from rtda_semanticsegmentation_tpu.train.optim import build_generator_tx
    from rtda_semanticsegmentation_tpu.train.schedule import poly_lr_schedule
    from rtda_semanticsegmentation_tpu.train.state import ModelState, TrainState
    from rtda_semanticsegmentation_tpu.train.steps import make_train_step

    cfg = get_preset("bisenet_source_aug")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, gta5_size=(H, W), cityscapes_size=(H, W)
        ),
        train=dataclasses.replace(cfg.train, batch_size=BATCH),
        augment=dataclasses.replace(cfg.augment, pipeline=pipeline),
    )
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, H, W, 3)),
        build_generator_tx(cfg.optimizer, 1000),
    )
    state = TrainState.create(g, None)
    step = jax.jit(
        make_train_step(cfg, poly_lr_schedule(cfg.optimizer.learning_rate, 1000)),
        donate_argnums=0,
    )
    rng = np.random.RandomState(0)
    b = {
        "image": jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 19, (BATCH, H, W), np.int32)),
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
    for pl in PIPELINES:
        sec = bench_pipeline(pl)
        if pl == "no_new_aug":
            base = sec
        delta = (sec - base) * 1e3 if base is not None else float("nan")
        print(
            f"{pl}: {sec * 1e3:.1f} ms/step (+{delta:.2f} ms vs no_new_aug)"
        )


if __name__ == "__main__":
    main()
