"""Jitted train steps — the whole per-batch loop body as one XLA program.

The reference's four epoch engines (``train.py:28,163``,
``train_lovasz.py:29,172``) differ only in loss composition; here they are
one step factory with static flags, so each mode is a single compiled
program containing: on-device augmentation, forward(s), loss, backward(s),
poly-LR, and both optimizer updates. No GradScaler: bf16 has f32's exponent
range.

Mode parity map:

- vanilla             == ``train_one_epoch``              (train.py:28)
- use_lovasz          == ``train_one_epoch_lovasz``       (train_lovasz.py:29)
- adversarial         == ``train_one_epoch_adversarial``  (train.py:163)
- adversarial+lovasz  == ``train_one_epoch_adversarial_lovasz`` (train_lovasz.py:172)

Adversarial semantics preserved exactly (reference ``train.py:238-313``):
one generator forward on source and target; D updated first on
stop-gradient'd softmax maps (source=real=1, target=fake=0, x0.5); G's loss
is seg(source) [+ w*Lovasz] + lambda*BCE(D_new(softmax(pred_t)), 1), where
D_new is the *post-update* discriminator (the reference steps D before G) and
pred_t is the pre-update-G prediction — gradients flow through D_new into G,
only G params update. BatchNorm batch statistics see source then target
sequentially, matching the reference's two successive train-mode forwards.

Under the SPMD mesh the batch arrives sharded on ``data``; XLA turns the
loss mean into a cross-replica reduction, so gradient all-reduce and sync-BN
are emitted automatically — there is no explicit collective code here.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ExperimentConfig
from ..ops.augment import augment_batch, normalize_u8
from ..ops.losses import (
    bce_with_logits,
    cross_entropy_with_ignore,
    lovasz_softmax,
    lovasz_softmax_binned,
)
from .state import ModelState, TrainState

Metrics = Dict[str, jnp.ndarray]

REAL_LABEL = 1.0  # source domain (reference train.py:188-189)
FAKE_LABEL = 0.0  # target domain


def _watch_norms(params, grads, tag: str) -> Metrics:
    """Per-top-level-module L2 norms of parameters and gradients.

    TPU-native counterpart of the reference's ``wandb.watch(model,
    log="all")`` gradient/parameter tracking (``main.py:351-352``): instead
    of host-side histograms, fused on-device reductions per module (e.g.
    ``watch/g/spatial_path/grad_norm``), surfaced at
    ``obs.watch_freq_steps``. Keys are prefixed ``watch/`` so the loop can
    route them separately from the running train metrics.
    """
    out: Metrics = {}
    for mod, sub in params.items():
        out[f"watch/{tag}/{mod}/param_norm"] = optax.global_norm(sub)
    for mod, sub in grads.items():
        out[f"watch/{tag}/{mod}/grad_norm"] = optax.global_norm(sub)
    return out


def _block_mean(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Average-pool a (B, H, W, C) map by ``factor`` per spatial axis.

    ``adversarial.disc_downsample``: block-mean via reshape (XLA lowers it
    to a cheap reduce, no windowed gather). Applied to the LOGITS before
    the f32 softmax, so the full-resolution f32 probability map (~1.2 GB at
    batch 8 @ 512x1024) is never materialized — the discriminator sees
    softmax(block-mean logits), a probability map of the same output-space
    domain signal at 1/factor^2 the pixel work. factor=1 is the identity
    (reference parity: full-res softmax maps, train.py:249-307).
    """
    if factor == 1:
        return x
    b, h, w, c = x.shape
    if h % factor or w % factor:
        raise ValueError(
            f"adversarial.disc_downsample={factor} must divide the train "
            f"resolution; got a {h}x{w} map"
        )
    return x.reshape(b, h // factor, factor, w // factor, factor, c).mean(
        axis=(2, 4)
    )


def _apply_train(mstate: ModelState, params, batch_stats, x, remat: bool = False):
    """Train-mode forward; returns ((logits, aux1, aux2), new batch_stats).

    Models return (logits, aux1, aux2) in train mode; like every reference
    train loop the default loss uses outputs[0] only (``train.py:113-120``)
    — at ``loss.aux_weight == 0`` the aux heads are dead code XLA
    eliminates, so parity costs nothing. ``aux_weight > 0`` opts into the
    BiSeNet paper's auxiliary supervision (see ``_seg_loss``).

    ``remat`` wraps the forward in ``jax.checkpoint`` so the backward
    recomputes activations instead of keeping them resident — the standard
    TPU trade of MXU FLOPs for HBM when scaling batch or resolution.
    """

    def fwd(params, batch_stats, x):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            outs, mutated = mstate.apply_fn(
                variables, x, True, mutable=["batch_stats"]
            )
            new_bs = mutated["batch_stats"]
        else:
            outs = mstate.apply_fn(variables, x, True)
            new_bs = batch_stats
        if not isinstance(outs, tuple):
            outs = (outs, None, None)
        return outs, new_bs

    if remat:
        fwd = jax.checkpoint(fwd)
    return fwd(params, batch_stats, x)


def _seg_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: ExperimentConfig,
    aux: Tuple = (),
    mesh_ctx=None,
) -> Tuple[jnp.ndarray, Metrics]:
    ce = cross_entropy_with_ignore(logits, labels, cfg.loss.ignore_index)
    total, parts = ce, {"loss_ce": ce}
    if cfg.loss.aux_weight and any(a is not None for a in aux):
        # BiSeNet-paper auxiliary supervision on the two context-path heads
        # (opt-in; the reference computes but never uses them,
        # train.py:113-120).
        aux_ce = sum(
            cross_entropy_with_ignore(a, labels, cfg.loss.ignore_index)
            for a in aux
            if a is not None
        )
        total = total + cfg.loss.aux_weight * aux_ce
        parts["loss_aux"] = aux_ce
    if cfg.loss.use_lovasz:
        probas = jax.nn.softmax(
            logits.astype(jnp.promote_types(logits.dtype, jnp.float32)),
            axis=-1,
        )
        if cfg.loss.lovasz_impl == "binned":
            # mesh-aware: the Pallas histogram/backward run per data shard
            # under shard_map instead of being replicated by the partitioner
            lov = lovasz_softmax_binned(
                probas,
                labels,
                cfg.loss.ignore_index,
                bins=cfg.loss.lovasz_bins,
                pmesh=None if mesh_ctx is None else mesh_ctx.mesh,
                data_axis="data" if mesh_ctx is None else mesh_ctx.data_axis,
                interp=cfg.loss.lovasz_interp,
            )
        else:
            lov = lovasz_softmax(probas, labels, cfg.loss.ignore_index)
        total = total + cfg.loss.lovasz_weight * lov
        parts["loss_lovasz"] = lov
    return total, parts


def _prep_source(batch, key, cfg: ExperimentConfig):
    """On-device augmentation + normalization of the uint8 source batch.

    The stochastic pipeline applies to GTA5 (and the synthetic stand-in); a
    Cityscapes train source gets resize+normalize only, matching the
    reference's per-dataset transform pipelines (``config.py:204-241``).
    Resize happens host-side at decode.
    """
    images_u8, labels = batch["image"], batch["label"]
    augmentable = cfg.data.train_dataset != "cityscapes"
    if augmentable and cfg.augment.pipeline != "no_new_aug":
        return augment_batch(images_u8, labels, key, cfg.augment)
    # Normalize at >=f32 (f64 under the x64 parity tests — keeps the whole
    # step's math at the compute dtype; plain f32 in production).
    dt = jnp.promote_types(jnp.dtype(cfg.model.compute_dtype), jnp.float32)
    return normalize_u8(images_u8, cfg.augment, dtype=dt), labels


def make_train_step(
    cfg: ExperimentConfig,
    g_schedule: Callable,
    d_schedule: Optional[Callable] = None,
    mesh_ctx=None,
):
    """Build the per-batch step fn for the configured mode.

    Returns ``step(state, batch, rng) -> (state, metrics)`` where ``batch``
    holds uint8 NHWC ``image``, int32 NHW ``label`` and, in adversarial mode,
    uint8 NHWC ``target_image``. ``rng`` is a base key folded with
    ``state.step`` so each step draws fresh augmentation noise.
    """
    adversarial = cfg.adversarial.enabled
    if adversarial and cfg.adversarial.disc_downsample < 1:
        raise ValueError(
            "adversarial.disc_downsample must be >= 1, got "
            f"{cfg.adversarial.disc_downsample}"
        )

    def source_step(state: TrainState, batch, rng) -> Tuple[TrainState, Metrics]:
        key = jax.random.fold_in(rng, state.step)
        images, labels = _prep_source(batch, key, cfg)
        g = state.generator
        compute_dtype = jnp.dtype(cfg.model.compute_dtype)
        images = images.astype(compute_dtype)

        def loss_fn(params):
            (logits, sup1, sup2), new_bs = _apply_train(
                g, params, g.batch_stats, images, cfg.train.remat
            )
            loss, parts = _seg_loss(
                logits, labels, cfg, aux=(sup1, sup2), mesh_ctx=mesh_ctx
            )
            return loss, (new_bs, parts)

        (loss, (new_bs, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(g.params)
        new_g = g.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics = {
            "loss": loss,
            "lr": g_schedule(state.step),
            # global grad norm — the observable the reference's wandb.watch
            # gradient tracking provides (main.py:351-352)
            "grad_norm": optax.global_norm(grads),
            **parts,
        }
        if cfg.obs.watch_freq_steps > 0:
            metrics.update(_watch_norms(new_g.params, grads, "g"))
        new_state = state.replace(generator=new_g, step=state.step + 1)
        return new_state, metrics

    def adversarial_step(
        state: TrainState, batch, rng
    ) -> Tuple[TrainState, Metrics]:
        key = jax.random.fold_in(rng, state.step)
        images_s, labels_s = _prep_source(batch, key, cfg)
        compute_dtype = jnp.dtype(cfg.model.compute_dtype)
        images_t = normalize_u8(
            batch["target_image"],
            cfg.augment,
            dtype=jnp.promote_types(compute_dtype, jnp.float32),
        )
        images_s = images_s.astype(compute_dtype)
        images_t = images_t.astype(compute_dtype)

        g, d = state.generator, state.discriminator
        use_aux = bool(cfg.loss.aux_weight)

        def g_forward(params):
            """Source then target forward — BN stats updated sequentially,
            matching the reference's two successive train-mode calls.
            Differentiable outputs: (pred_s, pred_t) plus the source aux
            heads when aux supervision is on (None-ness is static)."""
            (pred_s, s1, s2), bs1 = _apply_train(
                g, params, g.batch_stats, images_s, cfg.train.remat
            )
            (pred_t, _, _), bs2 = _apply_train(
                g, params, bs1, images_t, cfg.train.remat
            )
            aux = (
                tuple(a for a in (s1, s2) if a is not None) if use_aux else ()
            )
            return (pred_s, pred_t) + aux, bs2

        # ONE generator forward, shared by construction between the D step
        # (detached predictions) and the G backward (via the vjp pullback).
        # Calling g_forward twice and relying on XLA CSE leaves the FFM
        # head conv + its 1024-channel concat duplicated per domain
        # (scripts/check_adv_step_cse.py); this formulation is bit-identical
        # and strictly smaller.
        preds, g_pullback, new_bs = jax.vjp(g_forward, g.params, has_aux=True)
        pred_s0, pred_t0 = preds[0], preds[1]
        pool = cfg.adversarial.disc_downsample

        def disc_input(pred):
            """What D consumes: softmax of the (optionally block-mean
            pooled) logits, in compute dtype (reference train.py:249-307;
            pooling is the disc_downsample opt-in)."""
            pooled = _block_mean(pred, pool)
            # FC-Discriminator is five 4x4/s2/p1 convs: an input side < 32
            # collapses to a ZERO-size tensor inside the trunk and the BCE
            # mean over it is silently NaN (XLA supports 0-size arrays, so
            # nothing errors until the loss). Fail at trace time instead.
            if min(pooled.shape[1], pooled.shape[2]) < 32:
                raise ValueError(
                    f"discriminator input {pooled.shape[1]}x"
                    f"{pooled.shape[2]} (train resolution / "
                    f"disc_downsample={pool}) is below the 32-pixel "
                    "minimum side the 5-conv stride-2 trunk supports — "
                    "lower adversarial.disc_downsample or raise the "
                    "train resolution"
                )
            return jax.nn.softmax(
                pooled.astype(jnp.promote_types(pooled.dtype, jnp.float32)),
                axis=-1,
            ).astype(compute_dtype)

        sm_s = jax.lax.stop_gradient(disc_input(pred_s0))
        sm_t = jax.lax.stop_gradient(disc_input(pred_t0))

        def d_loss_fn(d_params):
            # Two separate D calls; a single batched call over
            # [source; target] (exact — D is per-sample, no BN) was tried
            # and measured ~5% SLOWER at b8: the 2x-batch concat of the
            # full-res softmax maps costs more HBM traffic than the saved
            # per-conv launches (scripts/bench_disc_phase.py context).
            out_s = d.apply_fn({"params": d_params}, sm_s)
            out_t = d.apply_fn({"params": d_params}, sm_t)
            loss_real = bce_with_logits(out_s, REAL_LABEL)
            loss_fake = bce_with_logits(out_t, FAKE_LABEL)
            return 0.5 * (loss_real + loss_fake)

        loss_d, d_grads = jax.value_and_grad(d_loss_fn)(d.params)
        new_d = d.apply_gradients(d_grads)

        # --- Generator step (reference train.py:280-306) ---
        # Loss on the shared forward's predictions; adv term goes through
        # the *updated* D; gradients reach the params via the pullback.
        def g_loss_fn(live_preds):
            pred_s, pred_t = live_preds[0], live_preds[1]
            loss_seg, parts = _seg_loss(
                pred_s, labels_s, cfg, aux=live_preds[2:], mesh_ctx=mesh_ctx
            )
            sm_t_live = disc_input(pred_t)
            d_out = new_d.apply_fn({"params": new_d.params}, sm_t_live)
            loss_adv = bce_with_logits(d_out, REAL_LABEL)
            total = loss_seg + cfg.adversarial.lambda_adv * loss_adv
            parts = {**parts, "loss_seg": loss_seg, "loss_adv_g": loss_adv}
            return total, parts

        (loss_g, parts), dpreds = jax.value_and_grad(g_loss_fn, has_aux=True)(
            preds
        )
        (g_grads,) = g_pullback(dpreds)
        new_g = g.apply_gradients(g_grads).replace(batch_stats=new_bs)

        metrics = {
            "loss": loss_g,
            "loss_d": loss_d,
            "lr": g_schedule(state.step),
            "lr_d": d_schedule(state.step),
            "grad_norm": optax.global_norm(g_grads),
            "grad_norm_d": optax.global_norm(d_grads),
            **parts,
        }
        if cfg.obs.watch_freq_steps > 0:
            metrics.update(_watch_norms(new_g.params, g_grads, "g"))
            metrics.update(_watch_norms(new_d.params, d_grads, "d"))
        new_state = state.replace(
            generator=new_g, discriminator=new_d, step=state.step + 1
        )
        return new_state, metrics

    return adversarial_step if adversarial else source_step
