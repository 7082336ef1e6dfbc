"""Checkpoint subsystem tests: save/restore round-trips, resume semantics,
cross-format loading (vanilla <- adversarial), best/periodic streams."""

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
from rtda_semanticsegmentation_tpu.train.checkpoint import CheckpointManager
from rtda_semanticsegmentation_tpu.train.optim import (
    build_discriminator_tx,
    build_generator_tx,
)
from rtda_semanticsegmentation_tpu.train.state import ModelState, TrainState

H = W = 32


def small_cfg(tmp_path, adversarial=False) -> ExperimentConfig:
    cfg = ExperimentConfig()
    return cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
        train=dataclasses.replace(cfg.train, checkpoint_dir=str(tmp_path)),
        adversarial=dataclasses.replace(cfg.adversarial, enabled=adversarial),
    )


def make_state(cfg, with_disc=False) -> TrainState:
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, H, W, 3)),
        build_generator_tx(cfg.optimizer, 10),
    )
    d = None
    if with_disc:
        disc = build_discriminator(cfg.model)
        d = ModelState.create(
            disc.apply,
            init_model(disc, jax.random.PRNGKey(1), (1, H, W, 19)),
            build_discriminator_tx(cfg.adversarial, 10),
        )
    return TrainState.create(g, d)


def mutate(state: TrainState) -> TrainState:
    g = state.generator.replace(
        params=jax.tree.map(lambda p: p + 1.0, state.generator.params)
    )
    return state.replace(
        generator=g,
        step=state.step + 7,
        best_miou=jnp.float32(0.42),
    )


def test_periodic_roundtrip_and_resume_epoch(tmp_path):
    cfg = small_cfg(tmp_path)
    mgr = CheckpointManager(cfg)
    state = mutate(make_state(cfg))
    mgr.save_periodic(state, epoch=4)
    mgr.wait()

    fresh = make_state(cfg)
    restored, meta = mgr.restore_into(fresh, "latest")
    assert meta["epoch"] == 4  # caller resumes at epoch 5
    assert int(restored.step) == 7
    assert float(restored.best_miou) == pytest.approx(0.42)
    chex_equal = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.generator.params,
        restored.generator.params,
    )
    assert all(jax.tree.leaves(chex_equal))
    mgr.close()


def test_best_checkpoint_carries_per_class_ious(tmp_path):
    cfg = small_cfg(tmp_path)
    mgr = CheckpointManager(cfg)
    state = mutate(make_state(cfg))
    ious = np.linspace(0, 1, 19).astype(np.float32)
    mgr.save_best(state, epoch=2, per_class_ious=ious)
    mgr.wait()
    _, meta = mgr.restore_into(make_state(cfg), "best")
    np.testing.assert_allclose(meta["per_class_ious"], ious)
    mgr.close()


def test_vanilla_restores_adversarial_checkpoint(tmp_path):
    adv_cfg = small_cfg(tmp_path, adversarial=True)
    mgr = CheckpointManager(adv_cfg)
    adv_state = mutate(make_state(adv_cfg, with_disc=True))
    mgr.save_periodic(adv_state, epoch=1)
    mgr.wait()
    mgr.close()

    # A vanilla run pointing at the same dir restores G and ignores D
    # (reference utils.py:443-446 key fallback).
    van_cfg = small_cfg(tmp_path, adversarial=True)  # same dir name
    mgr2 = CheckpointManager(van_cfg)
    fresh = make_state(van_cfg)  # no discriminator
    restored, meta = mgr2.restore_into(fresh, "latest")
    assert restored.discriminator is None
    eq = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        adv_state.generator.params,
        restored.generator.params,
    )
    assert all(jax.tree.leaves(eq))
    mgr2.close()


def test_adversarial_roundtrip_restores_discriminator(tmp_path):
    cfg = small_cfg(tmp_path, adversarial=True)
    mgr = CheckpointManager(cfg)
    state = make_state(cfg, with_disc=True)
    state = state.replace(
        discriminator=state.discriminator.replace(
            params=jax.tree.map(lambda p: p * 2 + 3, state.discriminator.params)
        )
    )
    mgr.save_periodic(state, epoch=0)
    mgr.wait()
    restored, _ = mgr.restore_into(make_state(cfg, with_disc=True), "latest")
    eq = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.discriminator.params,
        restored.discriminator.params,
    )
    assert all(jax.tree.leaves(eq))
    mgr.close()


def test_restore_none_when_no_checkpoint(tmp_path):
    cfg = small_cfg(tmp_path)
    mgr = CheckpointManager(cfg)
    assert mgr.restore_into(make_state(cfg), "latest") is None
    mgr.close()


def test_optimizer_moments_restored_exactly(tmp_path):
    """Regression: cross-format restores must graft optax state by field
    name, not flattened dict-key order (which is alphabetical and silently
    misassigns moments)."""
    adv_cfg = small_cfg(tmp_path, adversarial=True)
    mgr = CheckpointManager(adv_cfg)
    state = make_state(adv_cfg, with_disc=True)
    # distinctive optimizer moments
    state = state.replace(
        generator=state.generator.replace(
            opt_state=jax.tree.map(
                lambda x: x + 3.25 if jnp.issubdtype(x.dtype, jnp.floating) else x,
                state.generator.opt_state,
            )
        )
    )
    mgr.save_periodic(state, epoch=0)
    mgr.wait()
    mgr.close()

    # vanilla restore of an adversarial checkpoint -> raw graft path
    mgr2 = CheckpointManager(small_cfg(tmp_path, adversarial=True))
    restored, _ = mgr2.restore_into(make_state(adv_cfg), "latest")
    eq = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.generator.opt_state,
        restored.generator.opt_state,
    )
    assert all(jax.tree.leaves(eq))
    mgr2.close()


def test_same_mode_resume_uses_template_path(tmp_path, capsys):
    cfg = small_cfg(tmp_path)
    mgr = CheckpointManager(cfg)
    mgr.save_periodic(make_state(cfg), epoch=0)
    mgr.wait()
    out = mgr.restore_into(make_state(cfg), "latest")
    assert out is not None
    captured = capsys.readouterr()
    assert "template restore failed" not in captured.out
    mgr.close()


def test_restore_rejects_unknown_stream(tmp_path):
    cfg = small_cfg(tmp_path)
    mgr = CheckpointManager(cfg)
    with pytest.raises(ValueError):
        mgr.restore_into(make_state(cfg), "/some/path")
    mgr.close()


def test_adversarial_restore_from_vanilla_raises_clean_error(tmp_path):
    """An adversarial resume from a vanilla checkpoint must raise the
    intended ValueError (not a NameError from the error-message path)."""
    v_cfg = small_cfg(tmp_path / "v")
    v_state = make_state(v_cfg)
    v_mgr = CheckpointManager(v_cfg)
    v_mgr.save_periodic(mutate(v_state), epoch=0)
    v_mgr.wait()

    a_cfg = small_cfg(tmp_path / "a", adversarial=True)
    a_state = make_state(a_cfg, with_disc=True)
    a_mgr = CheckpointManager(a_cfg)
    with pytest.raises(ValueError, match="no discriminator state"):
        a_mgr.restore_from_path(a_state, v_mgr.root)


def test_periodic_placeholder_ious_not_reported(tmp_path):
    """The all-zeros per-class-IoU placeholder in periodic checkpoints must
    restore as None, not as a fabricated metric table."""
    cfg = small_cfg(tmp_path)
    state = make_state(cfg)
    mgr = CheckpointManager(cfg)
    mgr.save_periodic(mutate(state), epoch=0)
    mgr.wait()
    _, meta = mgr.restore_into(make_state(cfg), "latest")
    assert meta.get("per_class_ious") is None

    ious = np.linspace(0.1, 0.9, 19).astype(np.float32)
    mgr.save_best(mutate(state), epoch=0, per_class_ious=ious)
    mgr.wait()
    _, meta = mgr.restore_into(make_state(cfg), "best")
    np.testing.assert_allclose(meta["per_class_ious"], ious)


def test_host_batches_per_epoch_meta_roundtrip(tmp_path):
    """ADVICE r1: the saving run's target-stream consumption rate rides in
    the checkpoint so a resume with a different epoch length realigns the
    adversarial target stream from the SAVED rate, not its own."""
    cfg = small_cfg(tmp_path)
    state = make_state(cfg)
    ckpt = CheckpointManager(cfg)
    ckpt.save_periodic(state, epoch=2, host_batches_per_epoch=37)
    ckpt.wait()
    _, meta = ckpt.restore_into(state, "latest")
    assert meta["host_batches_per_epoch"] == 37
    ckpt.close()
