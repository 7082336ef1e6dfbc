"""Experiment orchestration: the reference's ``main.py`` / ``main_adversarial.py``
pipelines as one config-driven function.

Pipeline parity (reference ``main.py:44-628``, ``main_adversarial.py:37-534``):
seeds -> loaders -> model(s) -> optimizer(s) -> losses -> resume -> epoch loop
(train epoch, validate, best/periodic checkpoint) -> reload best -> final
report (mIoU %, latency, GFLOPs, params M, per-class IoU table) -> summary.

TPU-native differences: the per-batch body is one jitted SPMD program over
the device mesh; validation is batched on device; checkpoints are Orbax
pytrees; observability works offline (jsonl) with the same metric keys.
"""

from __future__ import annotations

import itertools
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..config import ExperimentConfig
from ..data.datasets import build_dataset
from ..data.labels import CITYSCAPES_ID_TO_NAME
from ..data.loader import (
    InfiniteLoader,
    Loader,
    eval_batches,
    lookahead,
    prefetch_to_device,
    zip_source_target,
)
from ..models.factory import (
    build_discriminator,
    build_model,
    init_model,
    load_pretrained_backbone,
)
from ..obs import make_logger, performance_metrics
from ..parallel import create_mesh, globalize_batch, shard_state, sync_any_flag
from .checkpoint import CheckpointManager
from .evaluate import evaluate, make_eval_step
from .optim import build_discriminator_tx, build_generator_tx
from .schedule import poly_lr_schedule
from .state import ModelState, TrainState
from .steps import make_train_step


class NonFiniteLossError(RuntimeError):
    """A train metric went NaN/Inf (``train.halt_on_nonfinite``).

    Failure detection the reference lacks (SURVEY.md section 5 lists none):
    raised at a log point so at most ``print_freq_batch`` poisoned optimizer
    updates ran. Recovery: resume from the periodic 'latest' checkpoint
    (pre-divergence by construction — saves happen on epoch boundaries)
    with a lower LR, or rerun with ``--no_halt_on_nonfinite`` to ignore.
    """


def _check_finite(scalars: Dict[str, float], step: int, where: str) -> None:
    import math

    bad = {k: v for k, v in scalars.items() if not math.isfinite(v)}
    if bad:
        raise NonFiniteLossError(
            f"non-finite train metrics at step {step} ({where}): "
            + ", ".join(f"{k}={v}" for k, v in sorted(bad.items()))
            + ". Params are likely poisoned; resume from the 'latest' "
            "checkpoint with a lower learning rate."
        )


class Trainer:
    """Everything an experiment needs, built once from its config."""

    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        t = cfg.train

        # --- data (reference get_loaders, data_loader.py:53-224) ---
        self.train_ds = build_dataset(
            cfg.data.train_dataset, "train", cfg.train_size, cfg.data
        )
        self.val_ds = build_dataset(
            cfg.data.val_dataset, "val", cfg.eval_size, cfg.data
        )
        self.train_loader = Loader(
            self.train_ds,
            t.batch_size,
            shuffle=True,
            drop_last=True,
            seed=t.seed,
            num_workers=cfg.data.resolved_num_workers(),
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        self.target_loader: Optional[InfiniteLoader] = None
        if cfg.adversarial.enabled:
            # Target stream at the train resolution (reference uses the
            # Cityscapes train transforms, config.py:227-233).
            target_ds = build_dataset(
                cfg.data.adversarial_target_dataset,
                cfg.data.adversarial_target_split,
                cfg.data.train_size_override or cfg.data.cityscapes_size,
                cfg.data,
            )
            self.target_loader = InfiniteLoader(
                Loader(
                    target_ds,
                    t.batch_size,
                    shuffle=True,
                    drop_last=True,
                    seed=t.seed + 1,
                    num_workers=cfg.data.resolved_num_workers(),
                    process_index=jax.process_index(),
                    process_count=jax.process_count(),
                )
            )

        if (
            cfg.data.train_dataset == "cityscapes"
            and cfg.augment.pipeline != "no_new_aug"
        ):
            import warnings

            warnings.warn(
                f"augmentation pipeline {cfg.augment.pipeline!r} is inert for "
                "a Cityscapes train source (the reference applies stochastic "
                "augs to GTA5 only, config.py:204-241); set no_new_aug to "
                "silence this"
            )
        echo = max(1, t.data_echo)
        if echo > 1 and (
            cfg.augment.pipeline == "no_new_aug"
            or cfg.data.train_dataset == "cityscapes"
        ):
            import warnings

            warnings.warn(
                f"data_echo={t.data_echo} with a deterministic input "
                "pipeline (no_new_aug, or a Cityscapes train source where "
                "augmentation is inert) repeats bit-identical gradient "
                "steps — effectively a larger LR with momentum compounding. "
                "Echo is intended for stochastic augmentation pipelines."
            )
        # Echoed steps are real optimizer steps: the poly-LR horizon and
        # the optimizer schedules must count them, or LR hits zero after
        # 1/echo of training. An explicit steps_per_epoch bounds optimizer
        # steps directly (train_batches islices AFTER echoing).
        self.steps_per_epoch = t.steps_per_epoch or len(self.train_loader) * echo
        if self.steps_per_epoch <= 0:
            raise ValueError("empty training dataset")
        if t.steps_per_epoch and t.steps_per_epoch > len(self.train_loader) * echo:
            # islice cannot extend a finite epoch: the run would silently
            # train fewer steps per epoch than max_iter and the poly-LR
            # horizon assume (LR would end half-decayed, resume arithmetic
            # would drift).
            raise ValueError(
                f"train.steps_per_epoch={t.steps_per_epoch} exceeds the "
                f"{len(self.train_loader)} batches the dataset yields per "
                f"epoch (x data_echo {echo} = "
                f"{len(self.train_loader) * echo} optimizer steps); lower "
                "steps_per_epoch or raise data_echo"
            )
        self.max_iter = t.epochs * self.steps_per_epoch
        self.data_echo = echo
        # Target-stream consumption rate: one target batch per source HOST
        # batch (echoed steps reuse it). Persisted in checkpoints so resumes
        # with a different epoch length realign the stream correctly.
        self.host_batches_per_epoch = -(-self.steps_per_epoch // echo)

        # --- mesh (before model build: the discriminator's Pallas conv1
        # needs it for shard_map dispatch) ---
        self.mesh_ctx = create_mesh(cfg.mesh)
        n_data = self.mesh_ctx.num_data_shards
        if t.batch_size % n_data or cfg.data.eval_batch_size % n_data:
            raise ValueError(
                f"batch sizes (train {t.batch_size}, eval "
                f"{cfg.data.eval_batch_size}) must be divisible by the data "
                f"axis size {n_data}; set mesh.data or adjust batch sizes"
            )

        # --- models + optimizers (reference model_loader.py, main.py:279-310) ---
        h, w = cfg.train_size
        self.model = build_model(cfg.model)
        rng = jax.random.PRNGKey(t.seed)
        g_vars = init_model(self.model, rng, (1, h, w, 3))
        if cfg.model.pretrained_backbone:
            g_vars = load_pretrained_backbone(
                g_vars, cfg.model.pretrained_backbone, cfg.model.name
            )
        g = ModelState.create(
            self.model.apply,
            g_vars,
            # DeepLabV2 freezes BN affine params (reference deeplabv2.py:13-25)
            build_generator_tx(
                cfg.optimizer,
                self.max_iter,
                freeze_bn=(cfg.model.name == "deeplabv2"),
                # unused aux heads get no grad and no decay in the reference
                # (torch skips grad-None params) — keep them frozen
                decay_exempt=() if cfg.loss.aux_weight else (
                    "supervision1", "supervision2"
                ),
            ),
        )
        d = None
        if cfg.adversarial.enabled:
            self.disc = build_discriminator(cfg.model, self.mesh_ctx)
            d_vars = init_model(
                self.disc,
                jax.random.fold_in(rng, 1),
                (1, h, w, cfg.model.num_classes),
            )
            if cfg.adversarial.pretrained_discriminator:
                from ..models.convert import load_npz_into_variables

                d_vars = load_npz_into_variables(
                    d_vars,
                    cfg.adversarial.pretrained_discriminator,
                    "discriminator",
                )
            d = ModelState.create(
                self.disc.apply,
                d_vars,
                build_discriminator_tx(
                    cfg.adversarial, self.max_iter, cfg.optimizer.poly_power
                ),
            )
        self.state = TrainState.create(g, d)

        # --- sharding + compiled steps ---
        # Pure DP replicates; model>1 shards wide conv kernels (TP).
        self.state = shard_state(self.state, self.mesh_ctx)
        g_sched = poly_lr_schedule(
            cfg.optimizer.learning_rate, self.max_iter, cfg.optimizer.poly_power
        )
        d_sched = (
            poly_lr_schedule(
                cfg.adversarial.disc_learning_rate,
                self.max_iter,
                cfg.optimizer.poly_power,
            )
            if cfg.adversarial.enabled
            else None
        )
        self.train_step = jax.jit(
            make_train_step(cfg, g_sched, d_sched, mesh_ctx=self.mesh_ctx),
            donate_argnums=0,
        )
        self.eval_step = jax.jit(make_eval_step(cfg, self.model.apply))

        def _predict(variables, images_u8):
            from ..ops.augment import normalize_u8

            x = normalize_u8(images_u8, cfg.augment).astype(
                jax.numpy.dtype(cfg.model.compute_dtype)
            )
            return jax.numpy.argmax(self.model.apply(variables, x, False), -1)

        # one compiled forward for image logging / galleries (an un-jitted
        # model.apply dispatches every op separately)
        self.predict = jax.jit(_predict)
        # Explicit run names get isolated checkpoint dirs (no explicit
        # name -> the reference's shared per-model directory).
        self.ckpt = CheckpointManager(cfg, run_name=cfg.obs.run_name or "")
        self.aug_rng = jax.random.PRNGKey(t.seed + 17)

    # -- pieces ---------------------------------------------------------

    def train_batches(self):
        """One epoch of device-resident batches (UDA pairing if enabled).

        ``train.steps_per_epoch`` (when set) truncates the epoch — used for
        smoke runs and step-budgeted experiments; None walks the full
        dataset like the reference."""
        it = iter(self.train_loader)
        if self.target_loader is not None:
            it = zip_source_target(it, self.target_loader)
        echo = max(1, self.cfg.train.data_echo)
        steps = self.cfg.train.steps_per_epoch
        if steps is not None:
            # Bound HOST batches before prefetch so the step budget never
            # decodes/transfers batches it will discard.
            it = itertools.islice(it, -(-steps // echo))
        out = prefetch_to_device(
            it, self.mesh_ctx, self.cfg.data.prefetch_batches
        )
        if echo > 1:
            # Data echoing: repeat each device-resident batch (no extra H2D
            # transfer; each repeat is a real optimizer step with a fresh
            # augmentation key since rng folds in state.step).
            out = (b for batch in out for b in itertools.repeat(batch, echo))
        if steps is not None:
            # Bounds OPTIMIZER steps (echoed steps count), so step-budgeted
            # runs are comparable across echo factors.
            out = itertools.islice(out, steps)
        return out

    def g_variables(self) -> dict:
        return self.state.generator.variables

    def validate(self, eval_step=None, variables=None) -> Dict[str, Any]:
        """Full-val-set evaluation; ``eval_step``/``variables`` override the
        default bf16 path (used by the final int8 serving fidelity pass)."""

        def sharded_batches():
            # Shard each eval batch over the data axis so validation runs
            # data-parallel like training (hist/loss reductions become XLA
            # collectives); the reference validates image-by-image on one
            # device (validation.py:82-109).
            for images, labels, valid in eval_batches(
                self.val_ds,
                self.cfg.data.eval_batch_size,
                self.cfg.data.resolved_num_workers(),
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            ):
                yield tuple(
                    globalize_batch(self.mesh_ctx, a, is_local_shard=True)
                    for a in (images, labels, valid)
                )

        return evaluate(
            eval_step if eval_step is not None else self.eval_step,
            variables if variables is not None else self.g_variables(),
            lookahead(sharded_batches(), self.cfg.data.prefetch_batches),
            self.cfg.model.num_classes,
        )


class GracefulPreemption:
    """SIGTERM -> finish the in-flight step, checkpoint, exit cleanly.

    Preemptible/spot TPU VMs get SIGTERM with a short grace window before
    the kill; the reference's recovery story is "restart from the last
    periodic checkpoint by hand" (SURVEY.md section 5 — no preemption
    handling exists). Here the epoch loop polls this guard each step and, on
    a signal, saves the rolling 'latest' checkpoint and returns — the next
    run resumes with ``--resume latest``, replaying the interrupted epoch
    from its start (deterministic: the shuffle stream is keyed by
    ``seed + epoch``).

    Installs only where a handler can live (the main thread); elsewhere it
    degrades to an inert flag. Context-managed so the previous handler is
    restored on exit.
    """

    def __init__(self):
        self.requested = False
        self._prev = None
        self._installed = False

    def __enter__(self):
        import signal as _signal

        def _handler(signum, frame):
            self.requested = True

        try:
            self._prev = _signal.signal(_signal.SIGTERM, _handler)
            self._installed = True
        except ValueError:  # not the main thread of the main interpreter
            pass
        return self

    def __exit__(self, *exc):
        if self._installed:
            import signal as _signal

            # signal.signal() returns None when the previous handler was
            # installed from C (e.g. by an embedding launcher) — restoring
            # None raises TypeError, so fall back to the default action.
            _signal.signal(_signal.SIGTERM, self._prev or _signal.SIG_DFL)
        return False


def _preempted_exit(
    trainer, logger, state, epoch: int, best_per_class, say
) -> Dict[str, Any]:
    """Checkpoint + clean shutdown after a preemption signal.

    Saves the rolling 'latest' checkpoint with ``epoch - 1`` semantics; on
    ``--resume latest`` the loop re-enters the interrupted epoch and
    fast-forwards the already-trained steps (the mid-epoch position is
    encoded in the saved step counter), so the continuation is exactly the
    uninterrupted run — same shuffle position, LR schedule, and aug keys.
    Skips the final report/gallery — the VM's grace window is for saving,
    not profiling.
    """
    jax.block_until_ready(state.step)
    trainer.ckpt.save_periodic(state, epoch - 1, trainer.host_batches_per_epoch)
    trainer.ckpt.wait()
    step = int(state.step)
    say(
        f"SIGTERM received: saved 'latest' checkpoint at step {step} "
        f"(--resume latest continues epoch {epoch + 1} from that step)"
    )
    report: Dict[str, Any] = {
        "preempted": True,
        "best_miou": float(state.best_miou),
        "per_class_iou": (
            np.asarray(best_per_class) if best_per_class is not None else None
        ),
        "epochs": epoch,
        "global_step": step,
    }
    logger.summary(
        {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in report.items()
        }
    )
    logger.finish()
    trainer.ckpt.close()
    trainer.state = state
    report["trainer"] = trainer
    report["state"] = state
    return report


def _per_class_table(per_class_ious) -> str:
    lines = [f"{'class':<14s} IoU"]
    for cid, iou in enumerate(np.asarray(per_class_ious)):
        lines.append(f"{CITYSCAPES_ID_TO_NAME.get(cid, str(cid)):<14s} {iou:.4f}")
    return "\n".join(lines)


def run_experiment(
    cfg: ExperimentConfig,
    run_name: Optional[str] = None,
    measure_performance: bool = True,
    verbose: bool = True,
) -> Dict[str, Any]:
    """Train + validate + checkpoint + final report. Returns the report dict."""

    def say(msg: str) -> None:
        if verbose and jax.process_index() == 0:
            print(msg, flush=True)

    # One effective run name drives the logger AND checkpoint isolation.
    if run_name and not cfg.obs.run_name:
        import dataclasses as _dc

        cfg = cfg.replace(obs=_dc.replace(cfg.obs, run_name=run_name))
    trainer = Trainer(cfg)
    logger = make_logger(cfg, run_name)
    t = cfg.train
    state = trainer.state
    best_per_class = None
    start_epoch = 0
    resume_skip_steps = 0

    # --- resume (reference main.py:321-349) ---
    if t.resume_checkpoint:
        if t.resume_checkpoint in ("latest", "best"):
            out = trainer.ckpt.restore_into(state, t.resume_checkpoint)
            if out is None:
                # A short run may have written only the other stream
                # (periodic saves skip the final epoch and fire every N
                # epochs) — fall back rather than silently restarting.
                other = "best" if t.resume_checkpoint == "latest" else "latest"
                out = trainer.ckpt.restore_into(state, other)
                if out is not None:
                    say(
                        f"no '{t.resume_checkpoint}' checkpoint under "
                        f"{trainer.ckpt.root}; resuming from '{other}' instead"
                    )
            where = trainer.ckpt.root
        else:
            # Explicit path: reference RESUME_CHECKPOINT_PATH semantics
            # (config.py:54-56) — warm-start from any run's checkpoints.
            out = trainer.ckpt.restore_from_path(state, t.resume_checkpoint)
            where = t.resume_checkpoint
        if out is None:
            say(
                f"resume requested ({t.resume_checkpoint}) but no checkpoint "
                f"found under {where}; starting fresh"
            )
        else:
            state, meta = out
            state = shard_state(state, trainer.mesh_ctx)
            start_epoch = meta["epoch"] + 1
            best_per_class = meta.get("per_class_ious")
            say(
                f"resumed from epoch {meta['epoch']} "
                f"(step {int(state.step)}, best mIoU {meta['best_miou']:.4f})"
            )
            # A preemption checkpoint carries a MID-epoch step counter
            # (epoch-1 save semantics, _preempted_exit). Fast-forward the
            # resumed epoch's already-trained steps instead of replaying
            # them: skipping k optimizer-step batches leaves the loader's
            # seeded shuffle, the step counter, the poly-LR position, and
            # the fold_in(step) aug keys exactly where an uninterrupted run
            # would be — no double-training, no LR-horizon overshoot.
            extra = int(state.step) - start_epoch * trainer.steps_per_epoch
            if extra >= trainer.steps_per_epoch:
                # Whole epochs beyond the saved epoch index are complete:
                # one epoch when SIGTERM landed exactly at the boundary of
                # a same-config run; more than one means the checkpoint
                # came from a run with a different epoch length (warn).
                skipped_epochs = extra // trainer.steps_per_epoch
                start_epoch += skipped_epochs
                extra -= skipped_epochs * trainer.steps_per_epoch
                if skipped_epochs > 1:
                    import warnings

                    warnings.warn(
                        f"restored step {int(state.step)} spans "
                        f"{skipped_epochs} epochs beyond the saved epoch "
                        f"index at steps_per_epoch={trainer.steps_per_epoch}"
                        " — the checkpoint likely came from a run with a "
                        "different epoch length; continuing at the step "
                        "counter's epoch."
                    )
            if 0 < extra:
                resume_skip_steps = extra
                say(
                    f"mid-epoch checkpoint: fast-forwarding {extra} "
                    f"already-trained steps of epoch {start_epoch + 1}"
                )
            # shuffle-stream continuity: epoch N after resume uses the same
            # permutation an uninterrupted run would
            trainer.train_loader.set_epoch(start_epoch)
            if trainer.target_loader is not None:
                # The target stream's pass length is len(target), NOT the
                # source epoch length — it consumes one batch per source
                # HOST batch. Restore pass index + mid-pass offset from the
                # total host batches the completed epochs consumed (the
                # resumed epoch's fast-forward below replays its own target
                # pulls through the zipped stream). The SAVING run's
                # consumption rate is carried in the checkpoint: a resume
                # with a different epoch length / batch size / data_echo
                # must count the old run's pulls, not its own.
                hbpe = trainer.host_batches_per_epoch
                saved_hbpe = meta.get("host_batches_per_epoch") or hbpe
                if saved_hbpe != hbpe:
                    import warnings

                    warnings.warn(
                        f"checkpoint was written at {saved_hbpe} target "
                        f"pulls/epoch but this run makes {hbpe} — realigning "
                        "the target stream from the saved rate."
                    )
                trainer.target_loader.set_position(start_epoch * saved_hbpe)
            if start_epoch >= t.epochs:
                import warnings

                warnings.warn(
                    f"resumed checkpoint is at epoch {meta['epoch']} but "
                    f"train.epochs={t.epochs}: no epochs remain to train. "
                    "The run will emit its report from the restored weights "
                    "only — raise --epochs to continue training."
                )

    say(
        f"mode={cfg.train_mode} model={cfg.model.name}/{cfg.model.context_path} "
        f"mesh={dict(trainer.mesh_ctx.mesh.shape)} "
        f"steps/epoch={trainer.steps_per_epoch} max_iter={trainer.max_iter}"
    )

    # --- optional timeline trace of a few warm steps (TPU-native aux:
    # SURVEY.md section 5 notes the reference has no timeline tracer) ---
    trace_dir = None
    trace_skip = 3  # let compile + pipeline warm-up settle first
    trace_stop_after = None
    if t.profile_steps > 0 and jax.process_index() == 0:
        import os as _os

        trace_dir = _os.path.join(
            cfg.obs.log_dir, cfg.obs.run_name or "run", "trace"
        )

    # --- epoch loop (reference main.py:357-467) ---
    run_start_step = int(state.step)
    n_proc = jax.process_count()
    # Multi-host: the SIGTERM flag is host-local and lands at different
    # times on different hosts; breaking on it unsynchronized deadlocks the
    # pod in mismatched collectives. Agree via a tiny allgather every
    # PREEMPT_SYNC_EVERY steps (same count on every host, so the collective
    # calls align); single-process checks the local flag every step.
    PREEMPT_SYNC_EVERY = 16
    preempted = False

    def check_finite_or_halt(scalars: Dict[str, float], step: int, where: str):
        """The non-finite guard, flushing any in-flight profiler trace
        first — the captured profile is the main debugging artifact for
        exactly this failure and must not be lost to the raise."""
        nonlocal trace_stop_after
        try:
            _check_finite(scalars, step, where)
        except NonFiniteLossError:
            if trace_stop_after is not None:
                jax.profiler.stop_trace()
                trace_stop_after = None
            raise

    with GracefulPreemption() as preempt:
        for epoch in range(start_epoch, t.epochs):
            t0 = time.time()
            running: Dict[str, float] = {}
            n_batches = 0
            host_step = int(state.step)
            batches = trainer.train_batches()
            if resume_skip_steps:
                # Mid-epoch resume: pull the already-trained steps through
                # the loader (keeps the seeded shuffle position) without
                # training on them. One-time cost: the skipped host decodes.
                batches = itertools.islice(batches, resume_skip_steps, None)
                resume_skip_steps = 0
            for batch in batches:
                if (
                    trace_dir is not None
                    and trace_stop_after is None
                    and host_step - run_start_step >= trace_skip
                ):
                    jax.block_until_ready(state.step)  # drain warm-up dispatches
                    jax.profiler.start_trace(trace_dir)
                    trace_stop_after = host_step + t.profile_steps
                state, metrics = trainer.train_step(
                    batch=batch, rng=trainer.aug_rng, state=state
                )
                n_batches += 1
                host_step += 1
                if trace_stop_after is not None and host_step >= trace_stop_after:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    trace_stop_after = None
                    trace_dir_done, trace_dir = trace_dir, None
                    say(
                        f"  profiler trace of {t.profile_steps} steps -> "
                        f"{trace_dir_done} (view with TensorBoard)"
                    )
                # Accumulate metrics as device arrays — fetching (float())
                # every step would force a host sync per batch and stall the
                # dispatch pipeline; scalars cross to host at log points.
                # watch/* keys (per-module norms, reference wandb.watch) are
                # routed to their own log cadence, not the running means.
                for k, v in metrics.items():
                    if not k.startswith("watch/"):
                        running[k] = running.get(k, 0.0) + v
                if host_step % t.print_freq_batch == 0:
                    host = {
                        f"train/{k}": float(v)
                        for k, v in metrics.items()
                        if not k.startswith("watch/")
                    }
                    logger.log(host, host_step)
                    if t.halt_on_nonfinite:
                        check_finite_or_halt(host, host_step, "batch log point")
                watch_freq = cfg.obs.watch_freq_steps
                if watch_freq > 0 and host_step % watch_freq == 0:
                    logger.log(
                        {
                            k: float(v)
                            for k, v in metrics.items()
                            if k.startswith("watch/")
                        },
                        host_step,
                    )
                if n_proc == 1:
                    preempted = preempt.requested
                elif host_step % PREEMPT_SYNC_EVERY == 0:
                    preempted = sync_any_flag(preempt.requested)
                if preempted:
                    break
            if preempted:
                if trace_stop_after is not None:
                    jax.profiler.stop_trace()
                    trace_stop_after = None
                return _preempted_exit(
                    trainer, logger, state, epoch, best_per_class, say
                )
            epoch_means = {
                k: float(v) / max(n_batches, 1) for k, v in running.items()
            }
            if t.halt_on_nonfinite:
                # Catches divergence in epochs shorter than print_freq_batch
                # (a NaN in any batch makes the running mean NaN).
                check_finite_or_halt(epoch_means, int(state.step), "epoch mean")
            say(
                f"epoch {epoch + 1}/{t.epochs} "
                + " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(epoch_means.items())
                )
                + f" ({time.time() - t0:.1f}s)"
            )
            logger.log(
                {f"train_epoch/{k}": v for k, v in epoch_means.items()},
                int(state.step),
            )

            # --- validation (reference main.py:414-426) ---
            if (epoch + 1) % t.validate_freq_epoch == 0 or epoch == t.epochs - 1:
                trainer.state = state  # evaluate with current params
                val = trainer.validate()
                logger.log_validation(
                    val["miou"], val["loss"], val["per_class_iou"],
                    int(state.step),
                )
                say(
                    f"  val mIoU={val['miou']:.4f} loss={val['loss']:.4f} "
                    f"({int(val['num_images'])} images)"
                )
                # periodic mask-overlay image (reference validation.py:113-127:
                # first val sample every LOG_IMAGES_FREQ epochs)
                if (epoch + 1) % t.log_images_freq_epoch == 0 and len(trainer.val_ds):
                    try:
                        img_u8, label = trainer.val_ds.load(0)
                        pred = np.asarray(
                            trainer.predict(
                                trainer.g_variables(),
                                jax.numpy.asarray(img_u8)[None],
                            )[0]
                        )
                        logger.log_segmentation_images(
                            img_u8, label, pred, int(state.step)
                        )
                    except Exception as e:
                        say(f"validation image logging skipped: {e}")

                if val["miou"] > float(state.best_miou):
                    state = state.replace(
                        best_miou=jax.numpy.float32(val["miou"])
                    )
                    best_per_class = val["per_class_iou"]
                    trainer.ckpt.save_best(
                        state, epoch, best_per_class,
                        trainer.host_batches_per_epoch,
                    )
                    say(f"  new best mIoU {val['miou']:.4f} -> checkpoint saved")
                    if cfg.obs.upload_checkpoints:
                        trainer.ckpt.wait()
                        logger.save_dir(trainer.ckpt.best_dir)

            # periodic checkpoint, skipped on the final epoch
            # (reference config.py:46-58, main.py:458-467)
            if (epoch + 1) % t.save_checkpoint_freq_epoch == 0 and epoch != t.epochs - 1:
                trainer.ckpt.save_periodic(
                    state, epoch, trainer.host_batches_per_epoch
                )
                if cfg.obs.upload_checkpoints:
                    trainer.ckpt.wait()
                    logger.save_dir(trainer.ckpt.latest_dir)

    if trace_stop_after is not None:  # run ended mid-trace (very short runs)
        jax.profiler.stop_trace()
    elif trace_dir is not None:  # requested but the run was too short to start
        say(
            f"profiler trace NOT captured: the run ended before "
            f"{trace_skip} warm-up steps completed (total steps this run: "
            f"{int(state.step) - run_start_step})"
        )

    trainer.ckpt.wait()
    trainer.state = state
    final_step = int(state.step)

    # --- final report (reference main.py:481-621): reload the best
    # checkpoint so perf/prediction reporting uses the best model ---
    restored = trainer.ckpt.restore_into(state, "best")
    if restored is not None:
        state, meta = restored
        best_per_class = meta.get("per_class_ious", best_per_class)
        trainer.state = state

    report: Dict[str, Any] = {
        "best_miou": float(state.best_miou),
        "per_class_iou": (
            np.asarray(best_per_class) if best_per_class is not None else None
        ),
        "epochs": t.epochs,
        "global_step": final_step,
    }
    if measure_performance:
        # Reference measures at the Cityscapes eval resolution (512x1024
        # dummy input, utils.py:316-326) — here that size comes from config.
        perf_h, perf_w = cfg.eval_size
        perf = performance_metrics(
            trainer.model.apply,
            trainer.g_variables(),
            height=perf_h,
            width=perf_w,
            iterations=t.latency_iterations,
            warmup=t.warmup_iterations,
            dtype=jax.numpy.dtype(cfg.model.compute_dtype),
        )
        report.update(perf)

    if t.final_int8_eval:
        # int8 PTQ serving fidelity on the real validation set (TPU-native
        # addition, models/quantize.py): what mIoU does THIS trained model
        # lose when served through the s8 MXU path?
        try:
            from ..models.quantize import calibrate, freeze, quantized_model
            from ..ops.augment import normalize_u8

            calib = []
            for images, _, _ in eval_batches(
                trainer.val_ds, cfg.data.eval_batch_size, cfg.data.resolved_num_workers()
            ):
                calib.append(
                    normalize_u8(jax.numpy.asarray(images), cfg.augment)
                )
                if len(calib) >= 2:
                    break
            q_vars = freeze(
                cfg.model, calibrate(cfg.model, trainer.g_variables(), calib)
            )
            q_step = jax.jit(
                make_eval_step(cfg, quantized_model(cfg.model, frozen=True).apply)
            )
            q_val = trainer.validate(eval_step=q_step, variables=q_vars)
            report["int8_miou"] = float(q_val["miou"])
            report["int8_miou_delta"] = (
                report["int8_miou"] - report["best_miou"]
            )
        except Exception as e:  # best-effort, like the reference's W&B blocks
            say(f"int8 serving eval skipped: {e}")

    say("\n=== Final results ===")
    say(f"best mIoU: {report['best_miou'] * 100:.2f}%")
    if "int8_miou" in report:
        say(
            f"int8 serving mIoU: {report['int8_miou'] * 100:.2f}% "
            f"(delta {report['int8_miou_delta'] * 100:+.2f} pts vs bf16 best)"
        )
    if measure_performance:
        say(
            f"latency: {report['mean_latency_ms']:.2f} ± "
            f"{report['std_latency_ms']:.2f} ms  "
            f"({report['mean_fps']:.1f} FPS) @ {perf_w}x{perf_h}"
        )
        say(f"FLOPs: {report['flops_g']} G   params: {report['params_m']} M")
        # Per-module FLOPs + params table (reference prints fvcore's
        # flop_count_table(max_depth=3), main.py:603-621) — best-effort.
        try:
            from ..obs import flop_count_table

            table = flop_count_table(
                trainer.model,
                trainer.g_variables(),
                (1, perf_h, perf_w, 3),
                depth=3,
            )
            say(table)
            report["flop_table"] = table
        except Exception as e:
            say(f"per-module FLOP table skipped: {e}")
    if report["per_class_iou"] is not None:
        say(_per_class_table(report["per_class_iou"]))

    # End-of-run prediction gallery from the best model (reference
    # log_best_model_predictions, utils.py:563-645: 6 samples).
    try:
        n_gallery = min(6, len(trainer.val_ds))
        for i in range(n_gallery):
            img_u8, label = trainer.val_ds.load(i)
            pred = np.asarray(
                trainer.predict(
                    trainer.g_variables(), jax.numpy.asarray(img_u8)[None]
                )[0]
            )
            logger.log_segmentation_images(
                img_u8, label, pred, final_step, tag=f"best/prediction_{i}"
            )
    except Exception as e:  # gallery is best-effort, like the reference's W&B
        say(f"prediction gallery skipped: {e}")

    logger.summary(
        {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in report.items()
        }
    )
    logger.finish()
    trainer.ckpt.close()
    report["trainer"] = trainer
    report["state"] = state
    return report
