"""Checkpoint subsystem on Orbax.

Counterpart of reference ``utils.py:386-543`` with the same policy surface
(component #24 in SURVEY.md):

- Two checkpoint streams: a best-mIoU checkpoint saved on improvement and a
  periodic "latest" checkpoint overwritten every N epochs
  (reference ``config.py:46-58``, ``main.py:429-467``).
- State carried: epoch, global step, G (+ optional D) params/batch_stats/
  optimizer states, best_miou, and best-model per-class IoUs
  (reference ``main.py:436-456``, ``main_adversarial.py:396-416``).
- Epoch-granular resume with ``epoch + 1`` semantics
  (reference ``main.py:330-335``).
- The vanilla loader accepts adversarial checkpoints (restores G only),
  mirroring the reference's key fallback (``utils.py:443-446``).

TPU-native upgrades over the reference: saves are a single PyTree
(async-capable via Orbax), restore is sharding-aware (params restored
straight onto the mesh), and preemption recovery is "resume from latest" by
construction.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import ExperimentConfig
from .state import TrainState


def _state_tree(
    state: TrainState,
    epoch: int,
    per_class_ious=None,
    num_classes: int = 19,
    host_batches_per_epoch: int = 0,
) -> Dict[str, Any]:
    tree = {
        "epoch": epoch,
        "step": state.step,
        "best_miou": state.best_miou,
        # The saving run's target-stream consumption rate (host batches per
        # source epoch; 0 = no target stream). Resume uses it to realign the
        # adversarial target stream even when the resuming run's epoch
        # length/batch size/data_echo differ from the saving run's.
        "host_batches_per_epoch": host_batches_per_epoch,
        "generator": {
            "params": state.generator.params,
            "batch_stats": state.generator.batch_stats,
            "opt_state": state.generator.opt_state,
        },
        # Always present (zeros when unknown) so both checkpoint streams
        # share one structure and template restores never need fallbacks.
        "best_model_per_class_ious": (
            np.zeros(num_classes, np.float32)
            if per_class_ious is None
            else np.asarray(per_class_ious, np.float32)
        ),
    }
    if state.discriminator is not None:
        tree["discriminator"] = {
            "params": state.discriminator.params,
            "opt_state": state.discriminator.opt_state,
        }
    return tree


def _graft_tree(target, raw):
    """Rebuild ``target``'s pytree node types from an Orbax raw restore.

    Raw (template-less) restores turn namedtuples into dicts keyed by FIELD
    NAME, tuples into lists, and empty containers into None — so grafting by
    name/position is exact, unlike flattening the raw nest (whose dict-key
    leaf order is alphabetical and silently misassigns e.g. a 10-element
    optax chain). Used only for cross-format restores where the template
    cannot match (vanilla run <- adversarial checkpoint).
    """
    if raw is None:
        return target  # empty optax state node
    if isinstance(target, tuple) and hasattr(target, "_fields"):
        # raw is a field-name dict from a raw restore, or already the
        # namedtuple itself after a successful template restore
        values = (
            [raw[f] for f in target._fields]
            if isinstance(raw, dict)
            else list(raw)
        )
        return type(target)(
            *(_graft_tree(t, v) for t, v in zip(target, values))
        )
    if isinstance(target, (tuple, list)):
        if len(raw) != len(target):
            raise ValueError(
                f"checkpoint container length {len(raw)} != state {len(target)}"
            )
        return type(target)(
            _graft_tree(t, r) for t, r in zip(target, raw)
        )
    if isinstance(target, dict):
        return {k: _graft_tree(target[k], raw[k]) for k in target}
    return raw  # leaf


class CheckpointManager:
    """Best + periodic checkpointing with resume.

    Directory layout (one Orbax root per stream, mirroring the reference's
    ``best_miou_checkpoint.pth`` / ``checkpoint.pth`` pair)::

        <dir>/best/<step>/...
        <dir>/latest/<step>/...
    """

    def __init__(self, cfg: ExperimentConfig, run_name: str = ""):
        base = cfg.train.checkpoint_dir
        suffix = "_adversarial_GTA2City" if cfg.adversarial.enabled else ""
        # Reference dir convention: checkpoints/<model>[_adversarial_GTA2City]
        # (main.py:146, main_adversarial.py:112-114); an explicit run name
        # gets its own subdirectory so concurrent runs don't clobber each
        # other's checkpoints.
        name = run_name or f"{cfg.model.name}{suffix}"
        self.root = os.path.abspath(os.path.join(base, name))
        self.cfg = cfg
        opts = ocp.CheckpointManagerOptions(max_to_keep=1, create=True)
        self._streams = {
            "best": cfg.train.best_checkpoint_name,
            "latest": cfg.train.periodic_checkpoint_name,
        }
        self._best = ocp.CheckpointManager(
            os.path.join(self.root, self._streams["best"]), options=opts
        )
        self._latest = ocp.CheckpointManager(
            os.path.join(self.root, self._streams["latest"]), options=opts
        )

    @property
    def best_dir(self) -> str:
        return os.path.join(self.root, self._streams["best"])

    @property
    def latest_dir(self) -> str:
        return os.path.join(self.root, self._streams["latest"])

    # -- save ---------------------------------------------------------------

    def save_best(
        self, state: TrainState, epoch: int, per_class_ious,
        host_batches_per_epoch: int = 0,
    ) -> None:
        tree = _state_tree(
            state, epoch, per_class_ious, self.cfg.model.num_classes,
            host_batches_per_epoch,
        )
        self._best.save(int(state.step), args=ocp.args.StandardSave(tree))

    def save_periodic(
        self, state: TrainState, epoch: int, host_batches_per_epoch: int = 0
    ) -> None:
        """Overwrite the rolling 'latest' checkpoint (max_to_keep=1)."""
        tree = _state_tree(
            state, epoch, None, self.cfg.model.num_classes,
            host_batches_per_epoch,
        )
        self._latest.save(int(state.step), args=ocp.args.StandardSave(tree))

    def wait(self) -> None:
        self._best.wait_until_finished()
        self._latest.wait_until_finished()

    # -- restore ------------------------------------------------------------

    def _restore(self, mgr, state: TrainState) -> Optional[Dict[str, Any]]:
        """Returns the restored tree, or None if the stream is empty.

        Same-mode resumes take the safe template path (both save streams
        share one structure by construction). A structure mismatch means a
        cross-format restore (vanilla run reading an adversarial
        checkpoint); then a raw restore is grafted back onto the state's
        pytree types by field name/position (never by flattened leaf order).
        """
        step = mgr.latest_step()
        if step is None:
            return None
        template = _state_tree(state, 0, None, self.cfg.model.num_classes)
        try:
            return mgr.restore(step, args=ocp.args.StandardRestore(template))
        except (ValueError, KeyError, TypeError) as e:
            print(
                f"template restore failed ({type(e).__name__}: "
                f"{str(e)[:200]}); attempting cross-format raw restore "
                "(expected for checkpoints from an older tree layout or the "
                "other train mode)"
            )
        raw = mgr.restore(step)
        out = dict(raw)
        out["generator"] = {
            "params": raw["generator"]["params"],
            "batch_stats": raw["generator"]["batch_stats"],
            "opt_state": _graft_tree(
                state.generator.opt_state, raw["generator"]["opt_state"]
            ),
        }
        if state.discriminator is not None and "discriminator" in raw:
            out["discriminator"] = {
                "params": raw["discriminator"]["params"],
                "opt_state": _graft_tree(
                    state.discriminator.opt_state,
                    raw["discriminator"]["opt_state"],
                ),
            }
        return out

    def restore_into(
        self, state: TrainState, which: str = "latest"
    ) -> Optional[tuple]:
        """Restore a checkpoint into ``state``; returns (state, meta) or None.

        ``meta`` = {'epoch', 'best_miou', 'per_class_ious'?}. Resume
        semantics: the caller restarts at ``meta['epoch'] + 1`` (reference
        ``main.py:330-335``). A vanilla run can restore an adversarial
        checkpoint — the discriminator subtree is simply ignored (reference
        ``utils.py:443-446``); the reverse raises.
        """
        if which not in ("latest", "best"):
            raise ValueError(
                f"resume checkpoint must be 'latest' or 'best', got {which!r}"
                f" (streams live under {self.root})"
            )
        mgr = self._latest if which == "latest" else self._best
        restored = self._restore(mgr, state)
        if restored is None:
            return None
        return self._apply_restored(state, restored)

    def restore_from_path(self, state: TrainState, path: str) -> Optional[tuple]:
        """Resume from an explicit checkpoint location on disk.

        Reference ``RESUME_CHECKPOINT_PATH`` semantics (``config.py:54-56``:
        any path, not just this run's directory) for warm-starting from
        another run. ``path`` may be a run root as written by training
        (containing ``<best>/``/``<latest>`` stream directories — 'latest'
        preferred) or one stream's Orbax root directly. Returns
        ``(state, meta)`` or None if nothing restorable exists there.
        """
        candidates = []
        for stream in (self._streams["latest"], self._streams["best"]):
            p = os.path.join(path, stream)
            if os.path.isdir(p):
                candidates.append(p)
        if not candidates and os.path.isdir(path):
            candidates = [path]
        opts = ocp.CheckpointManagerOptions(max_to_keep=1, create=False)
        for root in candidates:
            mgr = ocp.CheckpointManager(os.path.abspath(root), options=opts)
            try:
                restored = self._restore(mgr, state)
            finally:
                mgr.close()
            if restored is not None:
                return self._apply_restored(state, restored)
        return None

    def _apply_restored(self, state: TrainState, restored) -> tuple:
        g = state.generator.replace(
            params=restored["generator"]["params"],
            batch_stats=restored["generator"]["batch_stats"],
            opt_state=_graft_tree(
                state.generator.opt_state, restored["generator"]["opt_state"]
            ),
        )
        d = state.discriminator
        if d is not None:
            if "discriminator" not in restored:
                raise ValueError(
                    "adversarial resume needs an adversarial checkpoint; "
                    "the restored checkpoint has no discriminator state"
                )
            d = d.replace(
                params=restored["discriminator"]["params"],
                opt_state=_graft_tree(
                    d.opt_state, restored["discriminator"]["opt_state"]
                ),
            )
        new_state = state.replace(
            generator=g,
            discriminator=d,
            step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
            best_miou=jax.numpy.asarray(restored["best_miou"], jax.numpy.float32),
        )
        meta = {
            "epoch": int(restored["epoch"]),
            "best_miou": float(restored["best_miou"]),
            # 0 / absent (pre-r2 checkpoints) = unknown; the resume path
            # falls back to the current run's own epoch length.
            "host_batches_per_epoch": int(
                restored.get("host_batches_per_epoch", 0) or 0
            ),
        }
        if "best_model_per_class_ious" in restored:
            ious = np.asarray(restored["best_model_per_class_ious"])
            # Periodic checkpoints store an all-zeros placeholder
            # (_state_tree) so both streams share one structure; don't let
            # the placeholder masquerade as a real per-class IoU table.
            meta["per_class_ious"] = ious if ious.any() else None
        return new_state, meta

    def restore_variables(self, which: str = "best") -> Optional[tuple]:
        """Weights-only restore for inference: (variables, meta) or None.

        Template-free raw restore that returns only the generator's
        ``{'params', 'batch_stats'?}`` — serving needs no optimizer state,
        so this works across optimizer configs and train modes (vanilla or
        adversarial checkpoints alike). Used by ``cli/predict.py``.
        """
        if which not in ("latest", "best"):
            raise ValueError(
                f"checkpoint stream must be 'latest' or 'best', got {which!r}"
            )
        mgr = self._latest if which == "latest" else self._best
        step = mgr.latest_step()
        if step is None:
            return None
        raw = mgr.restore(step)
        gen = raw["generator"]
        variables = {"params": gen["params"]}
        if gen.get("batch_stats"):
            variables["batch_stats"] = gen["batch_stats"]
        meta = {
            "epoch": int(raw["epoch"]),
            "best_miou": float(raw["best_miou"]),
            "step": int(raw["step"]),
        }
        return variables, meta

    def close(self) -> None:
        self.wait()
        self._best.close()
        self._latest.close()
