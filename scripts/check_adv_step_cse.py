"""Does XLA CSE the adversarial step's duplicated generator forward?

train/steps.py calls g_forward twice on identical inputs/params (once for
the D step's detached predictions, once inside the G grad) and relies on
XLA CSE to fold them. This compiles the flagship step on CPU at a tiny
shape and counts convolution ops in the optimized HLO, against a variant
restructured with jax.vjp so the forward exists exactly once by
construction. Equal counts => CSE works and the simple formulation stands.

Run on CPU:  python scripts/check_adv_step_cse.py
"""

from __future__ import annotations

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import dataclasses
import re

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

import jax.numpy as jnp
import numpy as np


def build(h=64, w=64, batch=2):
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

    cfg = get_preset("bisenet_adversarial_lovasz")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
        data=dataclasses.replace(
            cfg.data, gta5_size=(h, w), cityscapes_size=(h, w)
        ),
        train=dataclasses.replace(cfg.train, batch_size=batch),
    )
    model = build_model(cfg.model)
    disc = build_discriminator(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, h, w, 3)),
        build_generator_tx(cfg.optimizer, 100),
    )
    d = ModelState.create(
        disc.apply,
        init_model(disc, jax.random.PRNGKey(1), (1, h, w, cfg.model.num_classes)),
        build_discriminator_tx(cfg.adversarial, 100),
    )
    state = TrainState.create(g, d)
    rng = np.random.RandomState(0)
    b = {
        "image": jnp.asarray(rng.randint(0, 256, (batch, h, w, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 19, (batch, h, w), np.int32)),
        "target_image": jnp.asarray(
            rng.randint(0, 256, (batch, h, w, 3), np.uint8)
        ),
    }
    sched_g = poly_lr_schedule(cfg.optimizer.learning_rate, 100)
    sched_d = poly_lr_schedule(cfg.adversarial.disc_learning_rate, 100)
    return cfg, state, b, sched_g, sched_d


def count_convs(step, state, b):
    lowered = jax.jit(step).lower(state, b, jax.random.PRNGKey(0))
    txt = lowered.compile().as_text()
    return len(re.findall(r"= [\w\[\],{}]* convolution", txt)), txt


def make_shared_fwd_step(cfg, sched_g, sched_d):
    """Adversarial step with the G forward shared by construction (vjp)."""
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8
    from rtda_semanticsegmentation_tpu.ops.losses import bce_with_logits
    from rtda_semanticsegmentation_tpu.train.steps import (
        FAKE_LABEL,
        REAL_LABEL,
        _apply_train,
        _prep_source,
        _seg_loss,
    )

    def step(state, batch, rng):
        key = jax.random.fold_in(rng, state.step)
        images_s, labels_s = _prep_source(batch, key, cfg)
        images_t = normalize_u8(batch["target_image"], cfg.augment)
        compute_dtype = jnp.dtype(cfg.model.compute_dtype)
        images_s = images_s.astype(compute_dtype)
        images_t = images_t.astype(compute_dtype)
        g, d = state.generator, state.discriminator

        def g_forward(params):
            (pred_s, _, _), bs1 = _apply_train(
                g, params, g.batch_stats, images_s, cfg.train.remat
            )
            (pred_t, _, _), bs2 = _apply_train(
                g, params, bs1, images_t, cfg.train.remat
            )
            return (pred_s, pred_t), bs2

        (pred_s, pred_t), pullback, new_bs = jax.vjp(
            g_forward, g.params, has_aux=True
        )

        sm_s = jax.lax.stop_gradient(
            jax.nn.softmax(pred_s.astype(jnp.float32), -1)
        ).astype(compute_dtype)
        sm_t = jax.lax.stop_gradient(
            jax.nn.softmax(pred_t.astype(jnp.float32), -1)
        ).astype(compute_dtype)

        def d_loss_fn(d_params):
            out_s = d.apply_fn({"params": d_params}, sm_s)
            out_t = d.apply_fn({"params": d_params}, sm_t)
            return 0.5 * (
                bce_with_logits(out_s, REAL_LABEL)
                + bce_with_logits(out_t, FAKE_LABEL)
            )

        loss_d, d_grads = jax.value_and_grad(d_loss_fn)(d.params)
        new_d = d.apply_gradients(d_grads)

        def loss_from_preds(preds):
            ps, pt = preds
            loss_seg, parts = _seg_loss(ps, labels_s, cfg)
            sm_live = jax.nn.softmax(pt.astype(jnp.float32), -1).astype(
                compute_dtype
            )
            d_out = new_d.apply_fn({"params": new_d.params}, sm_live)
            loss_adv = bce_with_logits(d_out, REAL_LABEL)
            return loss_seg + cfg.adversarial.lambda_adv * loss_adv, parts

        (loss_g, parts), dpreds = jax.value_and_grad(
            loss_from_preds, has_aux=True
        )((pred_s, pred_t))
        (g_grads,) = pullback(dpreds)
        new_g = g.apply_gradients(g_grads).replace(batch_stats=new_bs)
        new_state = state.replace(
            generator=new_g, discriminator=new_d, step=state.step + 1
        )
        return new_state, {"loss": loss_g, "loss_d": loss_d, **parts}

    return step


def main():
    from rtda_semanticsegmentation_tpu.train.steps import make_train_step

    cfg, state, b, sched_g, sched_d = build()
    current = make_train_step(cfg, sched_g, sched_d)
    n_cur, _ = count_convs(current, state, b)
    print(f"current step  : {n_cur} convolution ops")

    shared = make_shared_fwd_step(cfg, sched_g, sched_d)
    n_sh, _ = count_convs(shared, state, b)
    print(f"shared-fwd    : {n_sh} convolution ops")

    s1, m1 = jax.jit(current)(state, b, jax.random.PRNGKey(0))
    s2, m2 = jax.jit(shared)(state, b, jax.random.PRNGKey(0))
    dl = abs(float(m1["loss"]) - float(m2["loss"]))
    dd = abs(float(m1["loss_d"]) - float(m2["loss_d"]))
    leaves1 = jax.tree.leaves(s1.generator.params)
    leaves2 = jax.tree.leaves(s2.generator.params)
    dmax = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(leaves1, leaves2)
    )
    print(f"loss delta {dl:.2e}, loss_d delta {dd:.2e}, max param delta {dmax:.2e}")
    if n_cur > n_sh:
        print("=> CSE DOES NOT fold the duplicate forward; restructure wins")
    else:
        print("=> counts equal; XLA CSE already shares the forward")


if __name__ == "__main__":
    main()
