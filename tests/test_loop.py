"""End-to-end orchestration tests: run_experiment on the synthetic dataset
(tiny shapes, few steps), checkpoint creation, resume semantics, adversarial
pipeline wiring."""

import dataclasses
import glob
import json
import os

import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.config import ExperimentConfig
from rtda_semanticsegmentation_tpu.train.loop import run_experiment

H = W = 32


def e2e_cfg(tmp_path, **over) -> ExperimentConfig:
    cfg = ExperimentConfig()
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            train_dataset="synthetic",
            val_dataset="synthetic",
            gta5_size=(H, W),
            cityscapes_size=(H, W),
            eval_batch_size=4,
            num_workers=2,
            prefetch_batches=1,
            adversarial_target_dataset="synthetic",
            synthetic_length=16,
        ),
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
        train=dataclasses.replace(
            cfg.train,
            epochs=2,
            batch_size=4,
            steps_per_epoch=3,
            checkpoint_dir=str(tmp_path / "ckpt"),
            print_freq_batch=2,
            validate_freq_epoch=1,
        ),
        augment=dataclasses.replace(cfg.augment, pipeline="no_new_aug"),
        mesh=dataclasses.replace(cfg.mesh, data=4),
        obs=dataclasses.replace(
            cfg.obs, backend="jsonl", log_dir=str(tmp_path / "logs")
        ),
    )
    for k, v in over.items():
        sec, field_name = k.split("__")
        cfg = cfg.replace(
            **{sec: dataclasses.replace(getattr(cfg, sec), **{field_name: v})}
        )
    return cfg


def test_run_experiment_end_to_end(tmp_path):
    cfg = e2e_cfg(tmp_path)
    report = run_experiment(cfg, run_name="e2e", measure_performance=False, verbose=False)
    assert report["global_step"] == 6  # 2 epochs x 3 steps
    assert 0.0 <= report["best_miou"] <= 1.0
    assert report["per_class_iou"] is not None
    # best checkpoint exists
    # run_name isolates the checkpoint dir
    assert glob.glob(str(tmp_path / "ckpt" / "e2e" / "best_miou" / "*"))
    # jsonl log written with run_config + metrics + summary events
    log = tmp_path / "logs" / "e2e.jsonl"
    events = [json.loads(line)["event"] for line in open(log)]
    assert "run_config" in events and "metrics" in events and "summary" in events


def test_final_int8_eval_reports_delta(tmp_path):
    """--final_int8_eval: the report carries the int8 serving mIoU and its
    delta vs the bf16 best, computed on the real validation set."""
    cfg = e2e_cfg(tmp_path, train__final_int8_eval=True)
    report = run_experiment(
        cfg, run_name="int8e", measure_performance=False, verbose=False
    )
    assert "int8_miou" in report and "int8_miou_delta" in report
    assert np.isfinite(report["int8_miou"])
    # in-distribution eval of the same weights: quantization moves mIoU by
    # at most a few points even on a barely-trained model
    assert abs(report["int8_miou_delta"]) < 0.1, report["int8_miou_delta"]


def test_profile_steps_writes_trace(tmp_path):
    cfg = e2e_cfg(
        tmp_path, train__profile_steps=2, train__steps_per_epoch=6,
        train__epochs=1, data__synthetic_length=24,
    )
    run_experiment(
        cfg, run_name="prof", measure_performance=False, verbose=False
    )
    trace_root = os.path.join(str(tmp_path / "logs"), "prof", "trace")
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(trace_root)
        for f in fs
    ]
    assert files, f"no trace files under {trace_root}"


def test_resume_continues_from_checkpoint(tmp_path):
    cfg = e2e_cfg(tmp_path, train__save_checkpoint_freq_epoch=1, train__epochs=3)
    run_experiment(cfg, run_name="first", measure_performance=False, verbose=False)
    # New run with resume: restores and continues (epochs already done ->
    # zero additional epochs trained, but restore path is exercised)
    cfg2 = e2e_cfg(
        tmp_path,
        train__save_checkpoint_freq_epoch=1,
        train__epochs=3,
        train__resume_checkpoint="latest",
    )
    report = run_experiment(cfg2, run_name="second", measure_performance=False, verbose=False)
    # periodic saved at epochs 1 and 2 (not final); resume at epoch 2 -> one
    # more epoch of 3 steps on top of the 6 banked
    assert report["global_step"] == 9


def test_adversarial_end_to_end(tmp_path):
    cfg = e2e_cfg(
        tmp_path,
        adversarial__enabled=True,
        loss__use_lovasz=True,
    )
    report = run_experiment(cfg, run_name="adv", measure_performance=False, verbose=False)
    assert report["global_step"] == 6
    log = tmp_path / "logs" / "adv.jsonl"
    lines = [json.loads(line) for line in open(log)]
    keys = set().union(*(line.keys() for line in lines))
    assert any("loss_d" in k for k in keys), keys
    assert any("loss_lovasz" in k for k in keys), keys


def test_resume_falls_back_to_best_when_no_latest(tmp_path):
    """A short run writes only the best stream (periodic saves fire every 5
    epochs and skip the final one); resume=latest must fall back to best."""
    cfg = e2e_cfg(tmp_path, train__epochs=2)  # freq 5 -> no periodic saved
    run_experiment(cfg, run_name="short", measure_performance=False, verbose=False)
    cfg2 = e2e_cfg(tmp_path, train__epochs=3, train__resume_checkpoint="latest")
    report = run_experiment(cfg2, run_name="resumed", measure_performance=False, verbose=False)
    # best was saved at epoch with highest mIoU; resume at its epoch+1
    # then train the remaining epochs: banked 6 steps + (3 - (e+1)) * 3
    assert report["global_step"] > 6  # continued, not restarted


def test_graceful_preemption_guard_catches_sigterm():
    import os
    import signal

    from rtda_semanticsegmentation_tpu.train.loop import GracefulPreemption

    seen = []
    prev = signal.signal(signal.SIGTERM, lambda *_: seen.append("outer"))
    try:
        with GracefulPreemption() as guard:
            assert not guard.requested
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.requested  # flag set, process not killed
        # previous handler restored on exit
        os.kill(os.getpid(), signal.SIGTERM)
        assert seen == ["outer"]
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_preemption_checkpoints_and_resume_continues_exactly(tmp_path):
    """SIGTERM mid-training saves 'latest' and exits cleanly; --resume latest
    fast-forwards the already-trained steps of the interrupted epoch and
    continues exactly where the run stopped — the combined run performs the
    same optimizer steps as an uninterrupted one (reference has no
    preemption handling — SURVEY.md section 5)."""
    import signal
    import threading

    # A run far too long to finish (50 epochs x 3 steps); validation and
    # periodic saves disabled so the only checkpoint is the preemption save.
    cfg = e2e_cfg(
        tmp_path,
        train__epochs=50,
        train__validate_freq_epoch=1000,
        train__save_checkpoint_freq_epoch=1000,
    )
    # Safety net: if a signal lands before run_experiment installs its
    # guard, ignore it instead of dying; keep signalling until the run
    # reacts (the first signals typically arrive during XLA compiles).
    prev = signal.signal(signal.SIGTERM, lambda *_: None)
    stop = threading.Event()

    def pummel():
        while not stop.wait(1.0):
            os.kill(os.getpid(), signal.SIGTERM)

    th = threading.Thread(target=pummel, daemon=True)
    th.start()
    try:
        report = run_experiment(
            cfg, run_name="pre", measure_performance=False, verbose=False
        )
    finally:
        stop.set()
        th.join(timeout=5)
        signal.signal(signal.SIGTERM, prev)

    assert report.get("preempted") is True
    step_at_preempt = report["global_step"]
    assert step_at_preempt >= 1
    interrupted_epoch = report["epochs"]
    assert glob.glob(str(tmp_path / "ckpt" / "pre" / "latest" / "*"))
    # the jsonl summary records the preemption
    log = tmp_path / "logs" / "pre.jsonl"
    summaries = [
        json.loads(line) for line in open(log)
        if json.loads(line)["event"] == "summary"
    ]
    assert summaries and summaries[-1]["preempted"] is True

    # Resume: same run_name -> same checkpoint dir. The interrupted epoch's
    # already-trained steps are fast-forwarded, so the combined run ends at
    # exactly the step count an uninterrupted (interrupted_epoch+1)-epoch
    # run would reach — no step is trained twice.
    cfg2 = e2e_cfg(
        tmp_path,
        train__epochs=interrupted_epoch + 1,
        train__validate_freq_epoch=1000,
        train__save_checkpoint_freq_epoch=1000,
        train__resume_checkpoint="latest",
    )
    report2 = run_experiment(
        cfg2, run_name="pre", measure_performance=False, verbose=False
    )
    assert not report2.get("preempted")
    assert report2["global_step"] == (interrupted_epoch + 1) * 3


def test_resume_from_explicit_path(tmp_path):
    """--resume_checkpoint <path> warm-starts from another run's checkpoints
    (reference RESUME_CHECKPOINT_PATH, config.py:54-56)."""
    cfg = e2e_cfg(tmp_path, train__save_checkpoint_freq_epoch=1, train__epochs=3)
    run_experiment(cfg, run_name="donor", measure_performance=False, verbose=False)
    donor_root = str(tmp_path / "ckpt" / "donor")

    # run-root path: 'latest' stream preferred (saved at epoch idx 1, step 6)
    cfg2 = e2e_cfg(
        tmp_path,
        train__epochs=3,
        train__resume_checkpoint=donor_root,
        train__checkpoint_dir=str(tmp_path / "ckpt_b"),
    )
    report = run_experiment(
        cfg2, run_name="warm_root", measure_performance=False, verbose=False
    )
    # resumed at epoch 2 with 6 banked steps -> one more epoch of 3
    assert report["global_step"] == 9

    # direct stream-dir path (the best stream's Orbax root)
    cfg3 = e2e_cfg(
        tmp_path,
        train__epochs=3,
        train__resume_checkpoint=os.path.join(donor_root, "best_miou"),
        train__checkpoint_dir=str(tmp_path / "ckpt_c"),
    )
    report3 = run_experiment(
        cfg3, run_name="warm_stream", measure_performance=False, verbose=False
    )
    # best saved at epoch e (step 3(e+1)); resume trains the remaining
    # epochs: 3(e+1) + 3*(2-e) = 9 for any e
    assert report3["global_step"] == 9

    # nonexistent path: warn + start fresh
    cfg4 = e2e_cfg(
        tmp_path,
        train__resume_checkpoint=str(tmp_path / "nope"),
        train__checkpoint_dir=str(tmp_path / "ckpt_d"),
    )
    report4 = run_experiment(
        cfg4, run_name="fresh", measure_performance=False, verbose=False
    )
    assert report4["global_step"] == 6  # 2 epochs x 3 from scratch


def test_watch_and_checkpoint_upload_events(tmp_path):
    """watch_freq_steps emits watch/* metric events at the right cadence and
    upload_checkpoints emits artifact events (jsonl stand-in for
    wandb.save, reference utils.py:404-410)."""
    cfg = e2e_cfg(
        tmp_path,
        train__epochs=3,
        train__save_checkpoint_freq_epoch=1,
        obs__watch_freq_steps=2,
        obs__upload_checkpoints=True,
    )
    run_experiment(cfg, run_name="watched", measure_performance=False, verbose=False)
    events = [json.loads(l) for l in open(tmp_path / "logs" / "watched.jsonl")]
    watch = [
        e for e in events
        if e["event"] == "metrics"
        and any(k.startswith("watch/") for k in e)
    ]
    assert watch, "no watch events logged"
    for e in watch:
        assert e["step"] % 2 == 0
        # watch events carry only watch keys (+step/ts bookkeeping)
        assert all(
            k.startswith("watch/") or k in ("event", "step", "ts") for k in e
        )
        assert any(k.endswith("/grad_norm") for k in e)
    # train metric events never carry watch keys
    for e in events:
        if e["event"] == "metrics" and "train/loss" in e:
            assert not any(k.startswith("watch/") for k in e)
    arts = [e for e in events if e["event"] == "artifact"]
    assert arts, "no artifact events for uploaded checkpoints"
    for e in arts:
        assert os.path.isdir(e["path"])
    # both streams mirrored: best (epoch improvements) + periodic latest
    assert any(p["path"].endswith("best_miou") for p in arts)
    assert any(p["path"].endswith("latest") for p in arts)


def test_steps_per_epoch_beyond_dataset_rejected(tmp_path):
    """steps_per_epoch the dataset cannot supply must fail loudly: islice
    cannot extend a finite epoch, so the run would silently undertrain
    while max_iter / the poly-LR horizon / resume arithmetic assume the
    full count."""
    cfg = e2e_cfg(tmp_path, train__steps_per_epoch=99)
    with pytest.raises(ValueError, match="steps_per_epoch"):
        run_experiment(cfg, run_name="over", measure_performance=False,
                       verbose=False)


def test_data_echo_multiplies_steps(tmp_path):
    """Each loaded batch runs data_echo optimizer steps (fresh aug key via
    the state.step fold); steps_per_epoch still bounds optimizer steps."""
    # 16 synthetic samples / batch 4 = 4 loaded batches; echo 3, no
    # steps_per_epoch cap -> 12 optimizer steps per epoch. The e2e config
    # uses the deterministic no_new_aug pipeline, so the echo-degeneration
    # warning must fire.
    cfg = e2e_cfg(tmp_path, train__data_echo=3, train__steps_per_epoch=None,
                  train__epochs=1)
    with pytest.warns(UserWarning, match="data_echo"):
        report = run_experiment(
            cfg, run_name="echo", measure_performance=False, verbose=False
        )
    assert report["global_step"] == 12

    # With a step budget, echo does not overshoot it.
    cfg = e2e_cfg(tmp_path, train__data_echo=3, train__steps_per_epoch=5,
                  train__epochs=1)
    with pytest.warns(UserWarning, match="data_echo"):
        report = run_experiment(
            cfg, run_name="echo_capped", measure_performance=False,
            verbose=False,
        )
    assert report["global_step"] == 5


def test_data_echo_extends_lr_horizon(tmp_path):
    """Echoed steps count toward the poly-LR horizon: training must not
    spend its last (N-1)/N steps at LR 0."""
    from rtda_semanticsegmentation_tpu.train.loop import Trainer

    cfg = e2e_cfg(tmp_path, train__data_echo=3, train__steps_per_epoch=None,
                  train__epochs=2)
    with pytest.warns(UserWarning, match="data_echo"):
        tr = Trainer(cfg)
    # 16 samples / batch 4 = 4 loaded batches; echo 3 -> 12 steps/epoch
    assert tr.steps_per_epoch == 12
    assert tr.max_iter == 24


def test_check_finite_guard():
    from rtda_semanticsegmentation_tpu.train.loop import (
        NonFiniteLossError,
        _check_finite,
    )

    _check_finite({"train/loss": 0.5, "train/lr": 1e-4}, 10, "batch log point")
    with pytest.raises(NonFiniteLossError, match=r"step 7.*loss=nan"):
        _check_finite({"loss": float("nan"), "lr": 1e-4}, 7, "epoch mean")
    with pytest.raises(NonFiniteLossError, match="grad_norm=inf"):
        _check_finite({"grad_norm": float("inf")}, 3, "batch log point")


def test_divergent_run_halts_with_diagnostic(tmp_path):
    from rtda_semanticsegmentation_tpu.train.loop import NonFiniteLossError

    # An absurd LR poisons the params within a step or two; the guard must
    # halt at a log point (print_freq_batch=2) or the epoch mean with a
    # diagnostic instead of finishing the run on NaNs.
    cfg = e2e_cfg(tmp_path, optimizer__learning_rate=1e32)
    with pytest.raises(NonFiniteLossError, match="non-finite train metrics"):
        run_experiment(
            cfg, run_name="diverge", measure_performance=False, verbose=False
        )
    # With the guard off the same run must complete (reference behavior:
    # no failure detection at all).
    cfg2 = e2e_cfg(
        tmp_path, optimizer__learning_rate=1e32, train__halt_on_nonfinite=False
    )
    cfg2 = cfg2.replace(
        train=dataclasses.replace(cfg2.train, checkpoint_dir=str(tmp_path / "c2"))
    )
    report = run_experiment(
        cfg2, run_name="diverge_ok", measure_performance=False, verbose=False
    )
    assert report is not None


def test_pretrained_discriminator_warm_start(tmp_path):
    import numpy as _np

    from rtda_semanticsegmentation_tpu.train.loop import Trainer

    # Build a donor D npz from a fresh Trainer's own discriminator params.
    cfg0 = e2e_cfg(tmp_path, adversarial__enabled=True)
    donor = Trainer(cfg0)
    flat = {}
    import flax as _flax

    for k, v in _flax.traverse_util.flatten_dict(
        {"params": donor.state.discriminator.params}, sep="/"
    ).items():
        flat[k] = _np.asarray(v) + 1.0  # make values distinguishable
    path = tmp_path / "d.npz"
    _np.savez(path, **flat)

    cfg = e2e_cfg(
        tmp_path,
        adversarial__enabled=True,
        adversarial__pretrained_discriminator=str(path),
    )
    tr = Trainer(cfg)
    got = _np.asarray(tr.state.discriminator.params["conv1"]["bias"])
    want = _np.asarray(donor.state.discriminator.params["conv1"]["bias"]) + 1.0
    _np.testing.assert_allclose(got, want)
