"""Flagship (adversarial+Lovász) train-step phase decomposition (VERDICT r4 #4).

The vanilla step got its phase table in round 4; the flagship — the mode
the framework is named for — had its cost structure inferred from isolated
microbenches the repo itself distrusts (PERFORMANCE.md item 9). This times
a nested family of compiled programs at the flagship configuration
(BiSeNet-R18 + FC-Discriminator, 512x1024, bf16/f32) and differences them:

  aug           = full - noaug
  lovasz        = noaug - nolov          (binned Lovász fwd+bwd, 256 bins)
  G fwd         = both-domain train forward (fori ring)
  G bwd seg     = (G fwd + seg-loss vjp) - G fwd
  D fwd / D step = discriminator on fixed softmax maps (fwd; fwd+bwd)
  adv chain + optimizers = noaug - gfwdbwd_seg - dstep - dfwd (residual:
      G's adv term through updated D, softmax materializations, 2 optax
      updates)

Env: DECOMP_BATCH (default 8), DISC_DOWNSAMPLE (default 1).
Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_flagship_decomposition.py
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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 512, 1024
BATCH = int(os.environ.get("DECOMP_BATCH", "8"))
POOL = int(os.environ.get("DISC_DOWNSAMPLE", "1"))
ITERS = 20
V5E_PEAK_BF16 = 197e12


def build():
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
            cfg.adversarial, disc_downsample=POOL
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
        init_model(disc, jax.random.PRNGKey(1), (1, H, W, cfg.model.num_classes)),
        build_discriminator_tx(cfg.adversarial, 1000),
    )
    state = TrainState.create(g, d)

    variants = {}
    for tag, pipeline, lovasz in (
        ("full", cfg.augment.pipeline, True),
        ("noaug", "no_new_aug", True),
        ("nolov", "no_new_aug", False),
    ):
        c = cfg.replace(
            augment=dataclasses.replace(cfg.augment, pipeline=pipeline),
            loss=dataclasses.replace(cfg.loss, use_lovasz=lovasz),
        )
        variants[tag] = make_train_step(
            c,
            poly_lr_schedule(c.optimizer.learning_rate, 1000),
            poly_lr_schedule(c.adversarial.disc_learning_rate, 1000),
        )
    return cfg, model, disc, state, variants


def time_state_loop(step, state, batch) -> float:
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
    from rtda_semanticsegmentation_tpu.ops.losses import (
        bce_with_logits,
        cross_entropy_with_ignore,
        lovasz_softmax_binned,
    )
    from rtda_semanticsegmentation_tpu.train.steps import _apply_train, _block_mean

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) "
          f"batch={BATCH} disc_downsample={POOL}", flush=True)
    cfg, model, disc, state, variants = build()
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 19, (BATCH, H, W), np.int32)),
        "target_image": jnp.asarray(
            rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)
        ),
    }
    g, d = state.generator, state.discriminator
    imgs_s = normalize_u8(batch["image"], cfg.augment).astype(jnp.bfloat16)
    imgs_t = normalize_u8(batch["target_image"], cfg.augment).astype(jnp.bfloat16)
    labels = batch["label"]
    ring_s = jnp.stack([imgs_s, imgs_s * 1.001])
    ring_t = jnp.stack([imgs_t, imgs_t * 1.001])

    def g_forward(params, batch_stats, xs, xt):
        (pred_s, _, _), bs1 = _apply_train(g, params, batch_stats, xs)
        (pred_t, _, _), bs2 = _apply_train(g, params, bs1, xt)
        return pred_s, pred_t, bs2

    def gfwd_program(params, batch_stats, ring_s, ring_t, i):
        xs = jax.lax.dynamic_index_in_dim(ring_s, i % 2, keepdims=False)
        xt = jax.lax.dynamic_index_in_dim(ring_t, i % 2, keepdims=False)
        pred_s, pred_t, bs = g_forward(params, batch_stats, xs, xt)
        leaf = jax.tree_util.tree_leaves(bs)[0]
        return (
            jnp.sum(pred_s.astype(jnp.float32)) * 1e-9
            + jnp.sum(pred_t.astype(jnp.float32)) * 1e-9
            + leaf.reshape(-1)[0] * 1e-12
        )

    def gfwdbwd_seg_program(params, batch_stats, ring_s, ring_t, labels, i):
        xs = jax.lax.dynamic_index_in_dim(ring_s, i % 2, keepdims=False)
        xt = jax.lax.dynamic_index_in_dim(ring_t, i % 2, keepdims=False)

        def loss_fn(p):
            pred_s, pred_t, bs = g_forward(p, batch_stats, xs, xt)
            ce = cross_entropy_with_ignore(pred_s, labels, 255)
            probas = jax.nn.softmax(pred_s.astype(jnp.float32), -1)
            lov = lovasz_softmax_binned(probas, labels, 255, bins=256)
            # pred_t participates (flagship G grad flows through both
            # domains); weight the adv-free tie-in negligibly
            return (
                ce + 0.5 * lov + jnp.sum(pred_t.astype(jnp.float32)) * 1e-12,
                bs,
            )

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        import optax

        leaf = jax.tree_util.tree_leaves(bs)[0]
        return loss + optax.global_norm(grads) * 1e-12 + leaf.reshape(-1)[0] * 1e-12

    # fixed detached softmax maps for the D programs
    pred_s0, pred_t0, _ = jax.jit(g_forward)(
        g.params, g.batch_stats, imgs_s, imgs_t
    )

    def disc_input(pred):
        pooled = _block_mean(pred, POOL)
        return jax.nn.softmax(pooled.astype(jnp.float32), -1).astype(
            jnp.bfloat16
        )

    sm_s = jax.jit(disc_input)(pred_s0)
    sm_t = jax.jit(disc_input)(pred_t0)
    sm_ring = jnp.stack([sm_s, sm_t])

    def dfwd_program(d_params, sm_ring, i):
        x = jax.lax.dynamic_index_in_dim(sm_ring, i % 2, keepdims=False)
        out = d.apply_fn({"params": d_params}, x)
        return jnp.sum(out.astype(jnp.float32)) * 1e-6

    def dstep_program(d_params, sm_ring, i):
        xs = jax.lax.dynamic_index_in_dim(sm_ring, i % 2, keepdims=False)
        xt = jax.lax.dynamic_index_in_dim(sm_ring, (i + 1) % 2, keepdims=False)

        def d_loss(dp):
            out_s = d.apply_fn({"params": dp}, xs)
            out_t = d.apply_fn({"params": dp}, xt)
            return 0.5 * (bce_with_logits(out_s, 1.0) + bce_with_logits(out_t, 0.0))

        loss, grads = jax.value_and_grad(d_loss)(d_params)
        import optax

        return loss + optax.global_norm(grads) * 1e-9

    rows = {}
    rows["full"] = time_state_loop(variants["full"], state, batch)
    rows["noaug"] = time_state_loop(variants["noaug"], state, batch)
    rows["nolov"] = time_state_loop(variants["nolov"], state, batch)
    rows["gfwd"] = time_fori(gfwd_program, g.params, g.batch_stats, ring_s, ring_t)
    rows["gfwdbwd_seg"] = time_fori(
        gfwdbwd_seg_program, g.params, g.batch_stats, ring_s, ring_t, labels
    )
    rows["dfwd"] = time_fori(dfwd_program, d.params, sm_ring)
    rows["dstep"] = time_fori(dstep_program, d.params, sm_ring)

    key = jax.random.PRNGKey(0)
    fl_full = xla_flops(variants["full"], state, batch, key)

    print(f"\n== programs (b{BATCH} @ {W}x{H}, disc_downsample={POOL}) ==",
          flush=True)
    for tag in ("gfwd", "gfwdbwd_seg", "dfwd", "dstep", "nolov", "noaug", "full"):
        print(f"{tag:12s} {rows[tag] * 1e3:8.2f} ms", flush=True)

    aug = rows["full"] - rows["noaug"]
    lov = rows["noaug"] - rows["nolov"]
    gbwd_seg = rows["gfwdbwd_seg"] - rows["gfwd"] - lov  # seg CE bwd only-ish
    rest = rows["noaug"] - rows["gfwdbwd_seg"] - rows["dstep"] - rows["dfwd"]
    print("\n== phase view ==", flush=True)
    print(f"aug pipeline                {aug * 1e3:8.2f} ms", flush=True)
    print(f"G fwd (both domains)        {rows['gfwd'] * 1e3:8.2f} ms", flush=True)
    print(f"G bwd (CE seg, incl BN bwd) {gbwd_seg * 1e3:8.2f} ms", flush=True)
    print(f"lovasz fwd+bwd              {lov * 1e3:8.2f} ms", flush=True)
    print(f"D step (fwd+bwd, 2 maps)    {rows['dstep'] * 1e3:8.2f} ms "
          f"(fwd alone {rows['dfwd'] * 1e3:.2f})", flush=True)
    print(f"D fwd in G loss (3rd fwd)   {rows['dfwd'] * 1e3 / 2:8.2f} ms "
          f"(half the 2-map fwd)", flush=True)
    print(f"adv-chain+opt residual      {rest * 1e3:8.2f} ms", flush=True)
    if fl_full:
        mfu = fl_full / rows["full"] / V5E_PEAK_BF16
        print(f"\nfull step {rows['full'] * 1e3:.2f} ms = "
              f"{BATCH / rows['full']:.1f} img/s, MFU {mfu:.1%}", flush=True)


if __name__ == "__main__":
    main()
