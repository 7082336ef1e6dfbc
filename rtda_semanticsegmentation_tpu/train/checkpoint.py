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


def _state_tree(state: TrainState, epoch: int, per_class_ious=None) -> Dict[str, Any]:
    tree = {
        "epoch": epoch,
        "step": state.step,
        "best_miou": state.best_miou,
        "generator": {
            "params": state.generator.params,
            "batch_stats": state.generator.batch_stats,
            "opt_state": state.generator.opt_state,
        },
    }
    if state.discriminator is not None:
        tree["discriminator"] = {
            "params": state.discriminator.params,
            "opt_state": state.discriminator.opt_state,
        }
    if per_class_ious is not None:
        tree["best_model_per_class_ious"] = np.asarray(per_class_ious)
    return tree


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

    # -- save ---------------------------------------------------------------

    def save_best(self, state: TrainState, epoch: int, per_class_ious) -> None:
        tree = _state_tree(state, epoch, per_class_ious)
        self._best.save(int(state.step), args=ocp.args.StandardSave(tree))

    def save_periodic(self, state: TrainState, epoch: int) -> None:
        """Overwrite the rolling 'latest' checkpoint (max_to_keep=1)."""
        tree = _state_tree(state, epoch)
        self._latest.save(int(state.step), args=ocp.args.StandardSave(tree))

    def wait(self) -> None:
        self._best.wait_until_finished()
        self._latest.wait_until_finished()

    # -- restore ------------------------------------------------------------

    def _restore(self, mgr, state: TrainState) -> Optional[Dict[str, Any]]:
        step = mgr.latest_step()
        if step is None:
            return None
        template = _state_tree(state, 0)
        template["best_model_per_class_ious"] = np.zeros(
            self.cfg.model.num_classes, np.float32
        )
        try:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        except Exception:
            # Checkpoint without the per-class array (periodic stream) or a
            # D-less (vanilla) run restoring an adversarial checkpoint:
            # fall back to structural restore without a template.
            restored = mgr.restore(step)
        return restored

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
        g = state.generator.replace(
            params=restored["generator"]["params"],
            batch_stats=restored["generator"]["batch_stats"],
            opt_state=jax.tree.unflatten(
                jax.tree.structure(state.generator.opt_state),
                jax.tree.leaves(restored["generator"]["opt_state"]),
            ),
        )
        d = state.discriminator
        if d is not None:
            if "discriminator" not in restored:
                raise ValueError(
                    "adversarial resume needs an adversarial checkpoint; "
                    f"{self.root}/{which} has no discriminator state"
                )
            d = d.replace(
                params=restored["discriminator"]["params"],
                opt_state=jax.tree.unflatten(
                    jax.tree.structure(d.opt_state),
                    jax.tree.leaves(restored["discriminator"]["opt_state"]),
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
        }
        if "best_model_per_class_ious" in restored:
            meta["per_class_ious"] = np.asarray(
                restored["best_model_per_class_ious"]
            )
        return new_state, meta

    def close(self) -> None:
        self.wait()
        self._best.close()
        self._latest.close()
