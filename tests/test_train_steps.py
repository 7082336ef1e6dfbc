"""Train-step engine tests: all four modes + SPMD data parallelism.

Runs the real BiSeNet/FCDiscriminator at tiny resolution on the 8-device
virtual CPU mesh (SURVEY.md section 4's multi-chip test pattern).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.config import ExperimentConfig
from rtda_semanticsegmentation_tpu.models.factory import (
    build_discriminator,
    build_model,
    init_model,
)
from rtda_semanticsegmentation_tpu.parallel import create_mesh, shard_batch
from rtda_semanticsegmentation_tpu.train.evaluate import evaluate, make_eval_step
from rtda_semanticsegmentation_tpu.train.optim import (
    build_discriminator_tx,
    build_generator_tx,
)
from rtda_semanticsegmentation_tpu.train.schedule import poly_lr_schedule
from rtda_semanticsegmentation_tpu.train.state import ModelState, TrainState
from rtda_semanticsegmentation_tpu.train.steps import make_train_step

H, W, B, C = 64, 64, 4, 19
MAX_ITER = 100


def tiny_config(**kw) -> ExperimentConfig:
    cfg = ExperimentConfig()
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, gta5_size=(H, W), cityscapes_size=(H, W)
        ),
        train=dataclasses.replace(cfg.train, batch_size=B),
        # float32 on CPU for numerics; the config default (bf16) is for TPU.
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
    )
    for k, v in kw.items():
        section = getattr(cfg, k.split("__")[0])
        cfg = cfg.replace(
            **{k.split("__")[0]: dataclasses.replace(section, **{k.split("__")[1]: v})}
        )
    return cfg


def make_batch(seed=0, target=False):
    rng = np.random.RandomState(seed)
    batch = {
        "image": jnp.asarray(rng.randint(0, 256, (B, H, W, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, C, (B, H, W), np.int32)),
    }
    # Sprinkle ignore pixels.
    batch["label"] = batch["label"].at[:, 0, :].set(255)
    if target:
        batch["target_image"] = jnp.asarray(
            rng.randint(0, 256, (B, H, W, 3), np.uint8)
        )
    return batch


def build_state(cfg: ExperimentConfig, with_disc=False) -> TrainState:
    model = build_model(cfg.model)
    variables = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    tx = build_generator_tx(cfg.optimizer, MAX_ITER)
    g = ModelState.create(model.apply, variables, tx)
    d = None
    if with_disc:
        disc = build_discriminator(cfg.model)
        dvars = init_model(disc, jax.random.PRNGKey(1), (1, H, W, C))
        d = ModelState.create(
            disc.apply, dvars, build_discriminator_tx(cfg.adversarial, MAX_ITER)
        )
    return TrainState.create(g, d)


def fresh(state: TrainState) -> TrainState:
    """Deep-copy a state so donation in one test can't consume another's."""
    return jax.tree.map(jnp.copy, state)


@pytest.fixture(scope="module")
def vanilla_setup():
    cfg = tiny_config(augment__pipeline="no_new_aug")
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    step = jax.jit(make_train_step(cfg, g_sched), donate_argnums=0)
    return cfg, step, build_state(cfg)


def test_vanilla_step_runs_and_counts(vanilla_setup):
    cfg, step, state = vanilla_setup
    state = fresh(state)
    batch, rng = make_batch(), jax.random.PRNGKey(7)
    state1, m1 = step(state, batch, rng)
    assert int(state1.step) == 1
    assert np.isfinite(float(m1["loss"]))
    # lr follows the poly schedule at the pre-update step index
    expected_lr = cfg.optimizer.learning_rate * (1 - 0 / MAX_ITER) ** 0.9
    assert float(m1["lr"]) == pytest.approx(expected_lr, rel=1e-6)
    state2, m2 = step(state1, batch, rng)
    assert int(state2.step) == 2
    expected_lr2 = cfg.optimizer.learning_rate * (1 - 1 / MAX_ITER) ** 0.9
    assert float(m2["lr"]) == pytest.approx(expected_lr2, rel=1e-5)


def test_vanilla_loss_decreases_on_fixed_batch(vanilla_setup):
    cfg, step, state = vanilla_setup
    state = fresh(state)
    batch, rng = make_batch(3), jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_lovasz_mode_adds_component():
    cfg = tiny_config(loss__use_lovasz=True, augment__pipeline="no_new_aug")
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    step = jax.jit(make_train_step(cfg, g_sched))
    state = build_state(cfg)
    state, m = step(state, make_batch(), jax.random.PRNGKey(0))
    assert {"loss", "loss_ce", "loss_lovasz"} <= set(m)
    # total = ce + 0.5 * lovasz (reference train_lovasz.py:98-105)
    assert float(m["loss"]) == pytest.approx(
        float(m["loss_ce"]) + 0.5 * float(m["loss_lovasz"]), rel=1e-5
    )


def test_aux_weight_adds_component_and_changes_loss():
    """aux_weight opts into BiSeNet-paper aux supervision: loss_aux metric
    appears and total = ce + w * aux; weight 0 keeps reference parity
    (no loss_aux key, identical total)."""
    base = tiny_config(augment__pipeline="no_new_aug")
    g_sched = poly_lr_schedule(base.optimizer.learning_rate, MAX_ITER)
    state = build_state(base)
    batch, rng = make_batch(), jax.random.PRNGKey(0)

    step0 = jax.jit(make_train_step(base, g_sched))
    _, m0 = step0(fresh(state), batch, rng)
    assert "loss_aux" not in m0

    cfg = tiny_config(augment__pipeline="no_new_aug", loss__aux_weight=1.0)
    step1 = jax.jit(make_train_step(cfg, g_sched))
    _, m1 = step1(fresh(state), batch, rng)
    assert "loss_aux" in m1
    assert float(m1["loss"]) == pytest.approx(
        float(m1["loss_ce"]) + 1.0 * float(m1["loss_aux"]), rel=1e-5
    )
    # same params, same batch: the primary CE must agree across modes
    assert float(m1["loss_ce"]) == pytest.approx(float(m0["loss_ce"]), rel=1e-5)


def test_augmented_pipeline_step_runs():
    cfg = tiny_config(augment__pipeline="all_four_combined")
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    step = jax.jit(make_train_step(cfg, g_sched))
    state = build_state(cfg)
    state, m = step(state, make_batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


@pytest.fixture(scope="module")
def adv_setup():
    cfg = tiny_config(adversarial__enabled=True, augment__pipeline="no_new_aug")
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    d_sched = poly_lr_schedule(cfg.adversarial.disc_learning_rate, MAX_ITER)
    step = jax.jit(make_train_step(cfg, g_sched, d_sched))
    return cfg, step, build_state(cfg, with_disc=True)


def test_adversarial_step_updates_both_nets(adv_setup):
    cfg, step, state = adv_setup
    state = fresh(state)
    batch = make_batch(target=True)
    state1, m = step(state, batch, jax.random.PRNGKey(0))
    for k in ("loss", "loss_seg", "loss_adv_g", "loss_d", "lr", "lr_d"):
        assert k in m and np.isfinite(float(m[k])), k
    # Both param trees changed.
    g_diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.generator.params, state1.generator.params,
    )
    d_diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.discriminator.params, state1.discriminator.params,
    )
    assert max(jax.tree.leaves(g_diff)) > 0
    assert max(jax.tree.leaves(d_diff)) > 0
    # Fresh D on balanced real/fake: loss_D near log(2)/1... just sanity bound
    assert 0.0 < float(m["loss_d"]) < 2.0


def test_adversarial_with_aux_supervision_runs():
    """Aux heads flow through the shared-forward vjp (live_preds[2:])."""
    cfg = tiny_config(
        adversarial__enabled=True,
        augment__pipeline="no_new_aug",
        loss__aux_weight=1.0,
    )
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    d_sched = poly_lr_schedule(cfg.adversarial.disc_learning_rate, MAX_ITER)
    step = jax.jit(make_train_step(cfg, g_sched, d_sched))
    state, m = step(
        build_state(cfg, with_disc=True), make_batch(target=True),
        jax.random.PRNGKey(0),
    )
    assert "loss_aux" in m and np.isfinite(float(m["loss_aux"]))
    assert float(m["loss_aux"]) > 0
    # total still seg + lambda*adv; seg includes the aux term
    assert float(m["loss"]) == pytest.approx(
        float(m["loss_seg"])
        + cfg.adversarial.lambda_adv * float(m["loss_adv_g"]),
        rel=1e-5,
    )


def test_adversarial_total_is_seg_plus_lambda_adv(adv_setup):
    cfg, step, state = adv_setup
    state = fresh(state)
    state, m = step(state, make_batch(target=True), jax.random.PRNGKey(1))
    assert float(m["loss"]) == pytest.approx(
        float(m["loss_seg"]) + cfg.adversarial.lambda_adv * float(m["loss_adv_g"]),
        rel=1e-5,
    )


def test_dp_sharded_step_matches_single_device():
    """The 8-way data-parallel step must produce the same loss and params
    as the unsharded step — DP is a performance transform, not a semantic
    one."""
    cfg = tiny_config(augment__pipeline="no_new_aug")
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    step = make_train_step(cfg, g_sched)
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (8, H, W, 3), np.uint8)
        ),
        "label": jnp.asarray(
            np.random.RandomState(1).randint(0, C, (8, H, W), np.int32)
        ),
    }
    rng = jax.random.PRNGKey(0)

    state0 = build_state(cfg)
    _, m_single = jax.jit(step)(state0, batch, rng)

    ctx = create_mesh()
    assert ctx.num_data_shards == 8
    sharded_batch = {
        "image": shard_batch(ctx, np.asarray(batch["image"])),
        "label": shard_batch(ctx, np.asarray(batch["label"])),
    }
    state1 = jax.device_put(build_state(cfg), ctx.replicated())
    new_state, m_dp = jax.jit(step)(state1, sharded_batch, rng)
    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_single["loss"]), rtol=2e-5
    )


def test_eval_engine_matches_numpy_oracle():
    cfg = tiny_config()
    model = build_model(cfg.model)
    variables = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3), train=False)
    eval_step = jax.jit(make_eval_step(cfg, model.apply))

    rng = np.random.RandomState(0)
    batches = []
    for i in range(2):
        imgs = rng.randint(0, 256, (B, H, W, 3), np.uint8)
        labels = rng.randint(0, C, (B, H, W)).astype(np.int32)
        labels[:, :2, :] = 255
        valid = np.ones(B, bool)
        if i == 1:
            valid[-1] = False  # padded image
        batches.append((jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(valid)))

    out = evaluate(eval_step, variables, batches, C)
    assert out["num_images"] == 7
    assert 0.0 <= out["miou"] <= 1.0
    assert out["per_class_iou"].shape == (C,)
    # Oracle: recompute hist from argmax on host.
    hist = np.zeros((C, C), np.int64)
    for imgs, labels, valid in batches:
        from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8

        logits = model.apply(
            variables, normalize_u8(imgs, cfg.augment), False
        )
        preds = np.asarray(jnp.argmax(logits, -1))
        labels = np.asarray(labels)
        for b in range(B):
            if not valid[b]:
                continue
            l, p = labels[b].ravel(), preds[b].ravel()
            m = l != 255
            hist += np.bincount(
                C * l[m] + p[m], minlength=C * C
            ).reshape(C, C)
    np.testing.assert_array_equal(out["hist"], hist)


def test_deeplabv2_frozen_bn_params_not_updated():
    """Reference DeepLabV2 sets requires_grad=False on all BN affine params
    (deeplabv2.py:13-25); our optimizer masks them to zero updates while conv
    kernels still train."""
    from rtda_semanticsegmentation_tpu.train.optim import build_generator_tx

    cfg = tiny_config(model__name="deeplabv2", augment__pipeline="no_new_aug")
    model = build_model(cfg.model)
    variables = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    tx = build_generator_tx(cfg.optimizer, MAX_ITER, freeze_bn=True)
    g = ModelState.create(model.apply, variables, tx)
    state = TrainState.create(g)
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    step = jax.jit(make_train_step(cfg, g_sched))
    state1, _ = step(state, make_batch(), jax.random.PRNGKey(0))

    def diffs(tree_a, tree_b):
        flat_a = jax.tree_util.tree_flatten_with_path(tree_a)[0]
        flat_b = jax.tree.leaves(tree_b)
        out = {}
        for (path, a), b in zip(flat_a, flat_b):
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            out[keys] = float(jnp.abs(a - b).max())
        return out

    d = diffs(state.generator.params, state1.generator.params)
    bn_deltas = [v for k, v in d.items() if len(k) >= 2 and k[-2] == "bn"]
    conv_deltas = [v for k, v in d.items() if "conv" in k[-2] or k[-1] == "kernel"]
    assert bn_deltas and max(bn_deltas) == 0.0
    assert max(conv_deltas) > 0.0
    # but batch statistics DO update (train-mode BN semantics preserved)
    bs_diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.generator.batch_stats, state1.generator.batch_stats,
    )
    assert max(jax.tree.leaves(bs_diff)) > 0.0


def test_remat_step_matches_plain():
    """jax.checkpoint is a memory/compute trade, not a semantic change."""
    cfg = tiny_config(augment__pipeline="no_new_aug")
    cfg_r = cfg.replace(train=dataclasses.replace(cfg.train, remat=True))
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    batch, rng = make_batch(5), jax.random.PRNGKey(2)
    s0 = build_state(cfg)
    _, m_plain = jax.jit(make_train_step(cfg, g_sched))(fresh(s0), batch, rng)
    _, m_remat = jax.jit(make_train_step(cfg_r, g_sched))(fresh(s0), batch, rng)
    assert float(m_plain["loss"]) == pytest.approx(float(m_remat["loss"]), rel=1e-6)
    assert float(m_plain["grad_norm"]) == pytest.approx(
        float(m_remat["grad_norm"]), rel=1e-4
    )


def test_dp_tp_mesh_matches_single_device():
    """(data=4, model=2) mesh with output-channel TP on wide conv kernels
    produces the same loss as unsharded execution — multi-axis SPMD is a
    performance transform only."""
    from rtda_semanticsegmentation_tpu.config import MeshConfig
    from rtda_semanticsegmentation_tpu.parallel import shard_state

    cfg = tiny_config(augment__pipeline="no_new_aug")
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    step = make_train_step(cfg, g_sched)
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (8, H, W, 3), np.uint8)
        ),
        "label": jnp.asarray(
            np.random.RandomState(1).randint(0, C, (8, H, W), np.int32)
        ),
    }
    rng = jax.random.PRNGKey(0)
    _, m_single = jax.jit(step)(build_state(cfg), batch, rng)

    ctx = create_mesh(MeshConfig(data=4, model=2))
    assert dict(ctx.mesh.shape) == {"data": 4, "model": 2}
    state = shard_state(build_state(cfg), ctx, min_channels=128)
    # at least one kernel actually sharded on the model axis
    shardings = jax.tree.map(lambda x: x.sharding.spec, state.generator.params)
    assert any(
        spec == jax.sharding.PartitionSpec(None, None, None, "model")
        for spec in jax.tree.leaves(shardings, is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec))
    )
    sharded_batch = {
        "image": shard_batch(ctx, np.asarray(batch["image"])),
        "label": shard_batch(ctx, np.asarray(batch["label"])),
    }
    new_state, m_tp = jax.jit(step)(state, sharded_batch, rng)
    np.testing.assert_allclose(
        float(m_tp["loss"]), float(m_single["loss"]), rtol=2e-5
    )


def test_watch_norms_per_module(vanilla_setup):
    """obs.watch_freq_steps > 0 adds per-top-level-module grad/param norms
    (TPU-native wandb.watch counterpart, reference main.py:351-352)."""
    cfg, _, state = vanilla_setup
    assert not any(k.startswith("watch/") for k in _run_one(cfg, state))

    wcfg = tiny_config(
        augment__pipeline="no_new_aug", obs__watch_freq_steps=100
    )
    m = _run_one(wcfg, fresh(state))
    mods = set(state.generator.params)
    got_grad = {k.split("/")[2] for k in m if k.endswith("/grad_norm") and k.startswith("watch/g/")}
    got_param = {k.split("/")[2] for k in m if k.endswith("/param_norm") and k.startswith("watch/g/")}
    assert got_grad == mods and got_param == mods
    for k in m:
        if k.startswith("watch/"):
            assert np.isfinite(float(m[k])) and float(m[k]) >= 0, k
    # param norms are of the post-update params: nonzero for every module
    assert all(float(m[f"watch/g/{mod}/param_norm"]) > 0 for mod in mods)


def _run_one(cfg, state):
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    step = jax.jit(make_train_step(cfg, g_sched))
    _, m = step(state, make_batch(), jax.random.PRNGKey(0))
    return m


def test_watch_norms_adversarial_covers_both_nets():
    cfg = tiny_config(
        adversarial__enabled=True,
        augment__pipeline="no_new_aug",
        obs__watch_freq_steps=50,
    )
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    d_sched = poly_lr_schedule(cfg.adversarial.disc_learning_rate, MAX_ITER)
    step = jax.jit(make_train_step(cfg, g_sched, d_sched))
    state = build_state(cfg, with_disc=True)
    _, m = step(state, make_batch(target=True), jax.random.PRNGKey(0))
    g_mods = set(state.generator.params)
    d_mods = set(state.discriminator.params)
    assert {k.split("/")[2] for k in m if k.startswith("watch/g/")} == g_mods
    assert {k.split("/")[2] for k in m if k.startswith("watch/d/")} == d_mods


def test_block_mean_oracle_and_identity():
    from rtda_semanticsegmentation_tpu.train.steps import _block_mean

    rng = np.random.RandomState(0)
    p = rng.rand(2, 8, 12, 5).astype(np.float32)
    x = jnp.asarray(p)
    assert _block_mean(x, 1) is x  # factor 1 = identity, no op inserted
    for f in (2, 4):
        got = np.asarray(_block_mean(x, f))
        want = p.reshape(2, 8 // f, f, 12 // f, f, 5).mean(axis=(2, 4))
        np.testing.assert_allclose(got, want, rtol=1e-6)
    with pytest.raises(ValueError, match="disc_downsample"):
        _block_mean(x, 5)


def test_adversarial_disc_downsample_runs_and_changes_d_input():
    cfg = tiny_config(
        adversarial__enabled=True,
        augment__pipeline="no_new_aug",
        adversarial__disc_downsample=2,
    )
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    d_sched = poly_lr_schedule(cfg.adversarial.disc_learning_rate, MAX_ITER)
    step = jax.jit(make_train_step(cfg, g_sched, d_sched))
    batch = make_batch(target=True)
    state1, m1 = step(build_state(cfg, with_disc=True), batch, jax.random.PRNGKey(0))
    for k in ("loss", "loss_seg", "loss_adv_g", "loss_d"):
        assert np.isfinite(float(m1[k])), k

    # Same seeds at factor 1: the seg loss is untouched by the pooling
    # (identical G forward + loss), while D sees a different input.
    cfg0 = tiny_config(
        adversarial__enabled=True, augment__pipeline="no_new_aug"
    )
    step0 = jax.jit(make_train_step(cfg0, g_sched, d_sched))
    state0, m0 = step0(
        build_state(cfg0, with_disc=True), batch, jax.random.PRNGKey(0)
    )
    assert float(m0["loss_seg"]) == pytest.approx(float(m1["loss_seg"]), rel=1e-6)
    assert float(m0["loss_d"]) != pytest.approx(float(m1["loss_d"]), rel=1e-9)


def test_disc_downsample_validation():
    cfg = tiny_config(
        adversarial__enabled=True, adversarial__disc_downsample=0
    )
    with pytest.raises(ValueError, match="disc_downsample"):
        make_train_step(cfg, poly_lr_schedule(1e-3, 10), poly_lr_schedule(1e-4, 10))


def test_disc_downsample_degenerate_size_raises():
    # 64/4 = 16 < 32: the FC-Discriminator's 5-conv stride-2 trunk would
    # produce a zero-size tensor and a silently-NaN BCE mean; the step must
    # raise a clear error at trace time instead.
    cfg = tiny_config(
        adversarial__enabled=True,
        augment__pipeline="no_new_aug",
        adversarial__disc_downsample=4,
    )
    g_sched = poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER)
    d_sched = poly_lr_schedule(cfg.adversarial.disc_learning_rate, MAX_ITER)
    step = make_train_step(cfg, g_sched, d_sched)
    with pytest.raises(ValueError, match="32-pixel minimum"):
        step(
            build_state(cfg, with_disc=True),
            make_batch(target=True),
            jax.random.PRNGKey(0),
        )
