"""Learning-rate schedules.

The reference mutates ``optimizer.param_groups[0]['lr']`` every batch with a
polynomial decay (``utils.py:27-58``): ``lr = base * (1 - iter/max_iter)^power``
with ``max_iter = epochs * batches_per_epoch`` (``main.py:355``). Here the same
schedule is a pure step-indexed function fed to optax — it lives *inside* the
compiled train step, so there is no host-side LR bookkeeping, and in
adversarial mode the generator and discriminator schedules are driven from the
same global step (parity with reference ``train.py:229-236``).
"""

from __future__ import annotations

import jax.numpy as jnp


def poly_lr_schedule(base_lr: float, max_iter: int, power: float = 0.9):
    """Return an optax-compatible schedule fn: step -> lr.

    Exactly the reference formula ``base * (1 - step/max_iter) ** power``
    (``utils.py:52-53``). The value is clipped at 0 so that running past
    max_iter (e.g. a final partial epoch) cannot produce NaNs from a negative
    base raised to a fractional power.
    """
    if max_iter <= 0:
        raise ValueError(f"max_iter must be positive, got {max_iter}")

    def schedule(step) -> jnp.ndarray:
        frac = 1.0 - jnp.asarray(step, jnp.float32) / float(max_iter)
        return base_lr * jnp.maximum(frac, 0.0) ** power

    return schedule
