"""Model summaries: per-module parameter table + total analytic FLOPs.

Counterpart of the reference's fvcore ``flop_count_table(max_depth=3)`` +
parameter count report (``utils.py:328-340``): a per-module breakdown via
``flax.linen.tabulate`` and the compiled executable's total FLOPs from XLA
cost analysis (the compiler's ground truth rather than an operator table).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def model_summary_table(
    module,
    input_shape: Tuple[int, ...],
    depth: int = 3,
    train: bool = False,
) -> str:
    """Human-readable per-module table (params, shapes) like the reference's
    fvcore table."""
    import flax.linen as nn

    tab = nn.tabulate(
        module,
        jax.random.PRNGKey(0),
        depth=depth,
        console_kwargs={"width": 100, "force_terminal": False},
    )
    x = jnp.zeros(input_shape, jnp.float32)
    try:
        return tab(x, train)
    except TypeError:
        # Modules without a train switch (FCDiscriminator).
        return tab(x)


def flops_and_params(
    apply_fn,
    variables,
    input_shape: Tuple[int, ...],
    dtype=jnp.bfloat16,
) -> Tuple[Optional[float], int]:
    """(total forward FLOPs or None, parameter count)."""
    from .profiler import count_params, xla_flops

    x = jnp.zeros(input_shape, dtype)
    flops = xla_flops(lambda v, x: apply_fn(v, x, False), variables, x)
    return flops, count_params(variables["params"])
