"""Tensor parallelism over the ``model`` mesh axis.

The workload's natural strategy is DP (SURVEY.md section 2), but the mesh
reserves a ``model`` axis so the framework scales past pure data parallelism.
This module gives that axis teeth: large convolution kernels (and their
optimizer moments) are sharded on their output-channel dimension over
``model``; XLA's SPMD partitioner then propagates the channel sharding
through the network and inserts the required collectives on ICI. With
``model=1`` every rule degenerates to replication — pure DP is the zero-cost
default.

Sharding rule: any rank-4 leaf (conv kernels HWIO and their Adam/momentum
moments, which mirror param shapes) whose output-channel dim is divisible by
the model-axis size and at least ``min_channels`` wide is sharded
``P(None, None, None, 'model')``; everything else (BN vectors, small convs,
scalars) is replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MeshContext


def tp_shardings(tree: Any, ctx: MeshContext, min_channels: int = 256):
    """A pytree of NamedShardings for ``tree`` (params, opt state, or a whole
    TrainState) implementing the output-channel TP rule."""
    model = ctx.mesh.shape[ctx.model_axis]
    repl = ctx.replicated()
    if model == 1:
        return jax.tree.map(lambda _: repl, tree)
    channel_sharded = NamedSharding(
        ctx.mesh, P(None, None, None, ctx.model_axis)
    )

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if (
            len(shape) == 4
            and shape[-1] >= min_channels
            and shape[-1] % model == 0
        ):
            return channel_sharded
        return repl

    return jax.tree.map(rule, tree)


def shard_state(state, ctx: MeshContext, min_channels: int = 256):
    """device_put a TrainState with TP shardings (replication when model=1)."""
    return jax.device_put(state, tp_shardings(state, ctx, min_channels))
