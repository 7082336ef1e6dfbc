"""Device mesh + sharding helpers.

Design (see SURVEY.md section 2 "TPU-native equivalents"): a 2-D logical mesh
``(data, model)``.

- ``data`` — batch sharding. The jitted train step takes batch arrays sharded
  ``P('data', ...)`` and replicated params; XLA inserts the gradient
  all-reduce (psum over ICI) automatically from the sharding annotations.
  BatchNorm reductions over the batch axis likewise become cross-replica
  collectives, i.e. sync-BN falls out of SPMD for free.
- ``model`` — a spare tensor-parallel axis so the mesh design scales beyond
  DP (shard wide conv channels); every helper below is written against the
  mesh, not a device count, so ``model>1`` requires only new param
  PartitionSpecs, not new plumbing. The default is ``model=1`` (pure DP),
  which matches the CNN workload (largest model ~43M params fits per chip).

Multi-host: all helpers use ``jax.make_mesh`` over ``jax.devices()``, which
under a multi-controller runtime (``jax.distributed.initialize``) spans hosts
and slices; the data loader shards files by ``jax.process_index()``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """A mesh plus the precomputed shardings the train/eval steps use."""

    mesh: Mesh
    data_axis: str
    model_axis: str

    @property
    def num_data_shards(self) -> int:
        return self.mesh.shape[self.data_axis]

    def batch_spec(self, ndim: int) -> P:
        """Shard the leading (batch) dim on ``data``, replicate the rest."""
        return P(self.data_axis, *([None] * (ndim - 1)))

    def batch_sharding(self, ndim: int = 4) -> NamedSharding:
        return NamedSharding(self.mesh, self.batch_spec(ndim))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def create_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> MeshContext:
    """Build the (data, model) mesh from config.

    ``data=-1`` (default) consumes all devices not claimed by ``model``.
    """
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = cfg.model
    if model <= 0:
        raise ValueError(f"mesh.model must be >= 1, got {model}")
    if cfg.data > 0:
        data = cfg.data
    else:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        # Allow using a subset of devices when explicitly requested.
        if data * model > n:
            raise ValueError(
                f"mesh data={data} x model={model} needs {data * model} "
                f"devices, have {n}"
            )
        devices = devices[: data * model]
    dev_array = np.asarray(devices).reshape(data, model)
    mesh = Mesh(dev_array, (cfg.data_axis_name, cfg.model_axis_name))
    return MeshContext(
        mesh=mesh,
        data_axis=cfg.data_axis_name,
        model_axis=cfg.model_axis_name,
    )


def globalize_batch(ctx: MeshContext, array, is_local_shard: bool = False):
    """Turn a host numpy batch into a global jax.Array sharded over ``data``.

    Single-process: a plain sharded device_put. Multi-host: assembled with
    ``jax.make_array_from_process_local_data`` — device_put would treat the
    host's value as the whole global array. ``is_local_shard`` says whether
    the host holds only its slice of the global batch (the train Loader) or
    the full global batch (the eval loader), in which case this host's
    contiguous slice is cut out first (mesh device order follows
    ``jax.devices()``, which is grouped by process).
    """
    if jax.process_count() == 1:
        return jax.device_put(array, ctx.batch_sharding(np.ndim(array)))
    sharding = ctx.batch_sharding(np.ndim(array))
    if not is_local_shard:
        # Derive this process's batch rows from the sharding itself rather
        # than assuming 1/process_count contiguous ownership: with data=1
        # (model axis spanning hosts) every host owns the FULL replicated
        # batch, and uneven splits must fail loudly, not truncate.
        if array.shape[0] % ctx.num_data_shards:
            raise ValueError(
                f"global batch {array.shape[0]} not divisible by the data "
                f"axis ({ctx.num_data_shards})"
            )
        imap = sharding.devices_indices_map(tuple(np.shape(array)))
        rows = [imap[d][0] for d in sharding.addressable_devices]
        lo = min(r.start or 0 for r in rows)
        hi = max(
            array.shape[0] if r.stop is None else r.stop for r in rows
        )
        local = array[lo:hi]
        n_owned = sum(
            (array.shape[0] if r.stop is None else r.stop) - (r.start or 0)
            for r in {(r.start, r.stop): r for r in rows}.values()
        )
        if n_owned != local.shape[0]:
            raise ValueError(
                "this process's batch rows are not one contiguous range; "
                "reorder the mesh so the data axis groups by process"
            )
        array = local
    return jax.make_array_from_process_local_data(sharding, array)


def shard_batch(ctx: MeshContext, *arrays: Any):
    """Device-put host arrays (full global batches) with the batch dim
    sharded over ``data``.

    The global batch must divide by the data-axis size (the loader pads /
    drops to guarantee this, mirroring the reference's ``drop_last=True``,
    reference ``data_loader.py:209-214``).
    """
    out = tuple(globalize_batch(ctx, a) for a in arrays)
    return out[0] if len(out) == 1 else out
