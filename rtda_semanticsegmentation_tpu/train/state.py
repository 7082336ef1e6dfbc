"""Train state pytrees.

The reference keeps training state scattered across mutable objects (model,
optimizer, GradScaler, epoch/global_step ints, best_miou float — see its
checkpoint dict, reference ``main.py:436-456`` and
``main_adversarial.py:396-416``). Here the whole of it is one immutable
pytree so a training step is a pure function ``(state, batch, rng) ->
(state, metrics)`` and checkpointing is a single Orbax save of the pytree.

No GradScaler exists: TPU compute is bf16, whose exponent range matches f32,
so loss scaling is unnecessary (params and optimizer moments stay f32).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax.numpy as jnp
import optax


class ModelState(flax.struct.PyTreeNode):
    """One network + its optimizer."""

    params: Any
    batch_stats: Any  # {} for models without BN running stats
    opt_state: optax.OptState
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, variables, tx) -> "ModelState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )

    def apply_gradients(self, grads) -> "ModelState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )

    @property
    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


class TrainState(flax.struct.PyTreeNode):
    """Full training state: generator, optional discriminator, counters.

    ``step`` is the global batch counter the poly-LR schedules index
    (parity: reference ``main.py:355``, ``train.py:229-236`` drive G and D
    schedules from one shared global step). ``best_miou`` rides along so
    checkpoints carry it (reference ``main.py:447-456``).
    """

    generator: ModelState
    discriminator: Optional[ModelState]
    step: jnp.ndarray  # int32 scalar
    best_miou: jnp.ndarray  # f32 scalar

    @classmethod
    def create(cls, generator, discriminator=None) -> "TrainState":
        return cls(
            generator=generator,
            discriminator=discriminator,
            step=jnp.zeros((), jnp.int32),
            best_miou=jnp.zeros((), jnp.float32),
        )
