"""Vanilla train-step phase decomposition: where do the 33 ms go?

VERDICT r2 asked for a per-phase breakdown proving (or disproving) the
~19% train MFU ceiling. This times a nested family of compiled programs at
the vanilla configuration (BiSeNet-R18, b8 @ 512x1024, bf16/f32) and
differences them:

  aug        = full - full_noaug            (on-device augmentation pipeline)
  backward   = fwdbwd - fwd                 (reverse pass incl. BN/grad math)
  optimizer  = full_noaug - fwdbwd - eps    (optax update + param/BN writes)
  fwd        = loss forward (train mode, batch_stats mutation, CE loss)

Each program runs under the trusted ring/fori_loop protocol (one scalar
fetch for N iterations; see PERFORMANCE.md on why block_until_ready and
per-step fetches are both broken on this runner). XLA-analytic FLOPs per
program give a per-phase MFU so the table shows which phase is MXU-bound
and which is HBM/VPU-bound.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_step_decomposition.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 1024
BATCH = int(os.environ.get("DECOMP_BATCH", "8"))
# 'bisenet_source_aug' (default) or 'deeplabv2_cityscapes' — the latter
# reports the DeepLabV2 frozen-BN SGD train phase table (VERDICT r4 #6).
PRESET = os.environ.get("DECOMP_PRESET", "bisenet_source_aug")
ITERS, WARM_LOOPS = 20, 1
V5E_PEAK_BF16 = 197e12


def build():
    from rtda_semanticsegmentation_tpu.config import get_preset
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model
    from rtda_semanticsegmentation_tpu.train.optim import build_generator_tx
    from rtda_semanticsegmentation_tpu.train.schedule import poly_lr_schedule
    from rtda_semanticsegmentation_tpu.train.state import ModelState, TrainState
    from rtda_semanticsegmentation_tpu.train.steps import make_train_step

    cfg = get_preset(PRESET)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, gta5_size=(H, W), cityscapes_size=(H, W)
        ),
        train=dataclasses.replace(cfg.train, batch_size=BATCH),
    )
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, H, W, 3)),
        build_generator_tx(
            cfg.optimizer, 1000,
            freeze_bn=(cfg.model.name == "deeplabv2"),
        ),
    )
    state = TrainState.create(g, None)
    steps = {}
    for tag, pipeline in (("full", cfg.augment.pipeline), ("full_noaug", "no_new_aug")):
        c = cfg.replace(augment=dataclasses.replace(cfg.augment, pipeline=pipeline))
        steps[tag] = make_train_step(
            c, poly_lr_schedule(c.optimizer.learning_rate, 1000), None
        )
    return cfg, model, state, steps


def time_state_loop(step, state, batch) -> float:
    """Donated state-carrying step, ordered by the state round trip.

    The donated buffers are consumed, so each timed program gets its own
    fresh copy of ``state`` (the caller's copy stays alive for later
    programs)."""
    state = jax.tree.map(jnp.copy, state)
    step = jax.jit(step, donate_argnums=0)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        state, m = step(state, batch, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, batch, key)
    float(m["loss"])
    return (time.perf_counter() - t0) / ITERS


def time_fori(fn, *args) -> float:
    """fn(*args, i) -> scalar; ITERS calls inside one compiled fori_loop."""

    @jax.jit
    def loop(args, n):
        def body(i, acc):
            return acc + fn(*args, i)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(args, 3))
    t0 = time.perf_counter()
    float(loop(args, ITERS))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    from rtda_semanticsegmentation_tpu.obs.profiler import xla_flops
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8
    from rtda_semanticsegmentation_tpu.ops.losses import cross_entropy_with_ignore
    from rtda_semanticsegmentation_tpu.train.steps import _apply_train

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) preset={PRESET} "
          f"batch={BATCH}")
    cfg, model, state, steps = build()
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 19, (BATCH, H, W), np.int32)),
    }
    images = normalize_u8(batch["image"], cfg.augment).astype(jnp.bfloat16)
    labels = batch["label"]
    g = state.generator

    # ring of 2 scaled inputs so the fwd can't be hoisted; index-dependence
    # via dynamic slice like bench._time_batch
    img_ring = jnp.stack([images, images * 1.001])

    def fwd_program(params, batch_stats, img_ring, labels, i):
        x = jax.lax.dynamic_index_in_dim(img_ring, i % 2, keepdims=False)
        (logits, _, _), new_bs = _apply_train(g, params, batch_stats, x)
        loss = cross_entropy_with_ignore(logits, labels, cfg.loss.ignore_index)
        # keep the BN mutation alive without fetching the pytree
        leaf = jax.tree_util.tree_leaves(new_bs)[0]
        return loss + leaf.reshape(-1)[0] * 1e-12

    def fwdbwd_program(params, batch_stats, img_ring, labels, i):
        x = jax.lax.dynamic_index_in_dim(img_ring, i % 2, keepdims=False)

        def loss_fn(p):
            (logits, _, _), new_bs = _apply_train(g, p, batch_stats, x)
            loss = cross_entropy_with_ignore(
                logits, labels, cfg.loss.ignore_index
            )
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        import optax

        leaf = jax.tree_util.tree_leaves(new_bs)[0]
        return loss + optax.global_norm(grads) * 1e-12 + leaf.reshape(-1)[0] * 1e-12

    def infer_program(params, batch_stats, img_ring, i):
        x = jax.lax.dynamic_index_in_dim(img_ring, i % 2, keepdims=False)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, False
        )
        return jnp.sum(jnp.argmax(out, -1)).astype(jnp.float32)

    rows = {}
    rows["full"] = time_state_loop(steps["full"], state, batch)
    rows["full_noaug"] = time_state_loop(steps["full_noaug"], state, batch)
    rows["fwdbwd"] = time_fori(
        fwdbwd_program, g.params, g.batch_stats, img_ring, labels
    )
    rows["fwd"] = time_fori(
        fwd_program, g.params, g.batch_stats, img_ring, labels
    )
    rows["infer_fwd"] = time_fori(infer_program, g.params, g.batch_stats, img_ring)

    flops = {}
    flops["fwd"] = xla_flops(
        lambda p, bs: fwd_program(p, bs, img_ring, labels, jnp.int32(0)),
        g.params,
        g.batch_stats,
    )
    flops["fwdbwd"] = xla_flops(
        lambda p, bs: fwdbwd_program(p, bs, img_ring, labels, jnp.int32(0)),
        g.params,
        g.batch_stats,
    )
    flops["infer_fwd"] = xla_flops(
        lambda p, bs: infer_program(p, bs, img_ring, jnp.int32(0)),
        g.params,
        g.batch_stats,
    )
    key = jax.random.PRNGKey(0)
    flops["full"] = xla_flops(steps["full"], state, batch, key)
    flops["full_noaug"] = xla_flops(steps["full_noaug"], state, batch, key)

    print(f"\n== programs (b{BATCH} @ {W}x{H}) ==")
    for tag in ("infer_fwd", "fwd", "fwdbwd", "full_noaug", "full"):
        sec, fl = rows[tag], flops.get(tag)
        mfu = f"  MFU {fl / sec / V5E_PEAK_BF16:6.1%}" if fl else ""
        print(f"{tag:11s} {sec * 1e3:7.2f} ms  {fl / 1e9 if fl else 0:8.1f} GF{mfu}")

    print("\n== phase deltas ==")
    aug = rows["full"] - rows["full_noaug"]
    bwd = rows["fwdbwd"] - rows["fwd"]
    opt = rows["full_noaug"] - rows["fwdbwd"]
    bwd_fl = (
        flops["fwdbwd"] - flops["fwd"]
        if flops.get("fwdbwd") and flops.get("fwd") else None
    )
    print(f"aug pipeline      {aug * 1e3:7.2f} ms")
    print(f"forward (train)   {rows['fwd'] * 1e3:7.2f} ms  "
          f"(vs eval fwd {rows['infer_fwd'] * 1e3:.2f} ms)")
    bwd_fl_s = (
        f"({bwd_fl / 1e9:.1f} GF -> MFU {bwd_fl / bwd / V5E_PEAK_BF16:.1%})"
        if bwd_fl else "(cost analysis unavailable)"
    )
    print(f"backward          {bwd * 1e3:7.2f} ms  {bwd_fl_s}")
    print(f"optimizer+writes  {opt * 1e3:7.2f} ms")
    print(f"(full {rows['full'] * 1e3:.2f} = aug {aug * 1e3:.2f} + fwd "
          f"{rows['fwd'] * 1e3:.2f} + bwd {bwd * 1e3:.2f} + opt {opt * 1e3:.2f}"
          f" -> sum {(aug + rows['fwd'] + bwd + opt) * 1e3:.2f})")


if __name__ == "__main__":
    main()
