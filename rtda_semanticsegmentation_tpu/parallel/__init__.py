"""SPMD parallelism: device mesh construction and sharding rules.

The reference is a single-process, single-GPU trainer with no distributed
code (SURVEY.md section 2, "Parallelism & distributed communication"). Here
parallelism is a first-class subsystem: a ``jax.sharding.Mesh`` with a
``data`` axis (batch sharding / DP) and a spare ``model`` axis, with all
collectives (gradient all-reduce, cross-replica BatchNorm statistics, eval
confusion-matrix reduction) emitted by XLA from sharding annotations and
riding ICI.
"""

from .multihost import ensure_distributed, sync_any_flag
from .tp import shard_state, tp_shardings
from .mesh import (
    MeshContext,
    create_mesh,
    globalize_batch,
    shard_batch,
)

__all__ = [
    "MeshContext",
    "create_mesh",
    "shard_batch",
    "globalize_batch",
    "ensure_distributed",
    "shard_state",
    "sync_any_flag",
    "tp_shardings",
]
