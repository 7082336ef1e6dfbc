"""Model construction and initialization from config.

Counterpart of reference ``model_loader.py:16-98`` (dispatch on model name,
optional pretrained backbone, discriminator builder) — but returning pure
flax modules + parameter pytrees instead of stateful device-bound objects.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ExperimentConfig, ModelConfig
from .bisenet import BiSeNet
from .deeplabv2 import DeepLabV2
from .discriminator import FCDiscriminator


def build_model(cfg: ModelConfig):
    """Instantiate the generator module named by ``cfg.name``."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if cfg.name == "bisenet":
        return BiSeNet(
            num_classes=cfg.num_classes,
            context_path=cfg.context_path,
            dtype=dtype,
            fast_input=cfg.fast_input,
            quant=cfg.quant,
            quant_min_ch=cfg.quant_min_ch,
            quant_clip=cfg.quant_clip,
            quant_skip=cfg.quant_skip,
        )
    if cfg.name == "deeplabv2":
        return DeepLabV2(
            num_classes=cfg.num_classes, dtype=dtype, fast_input=cfg.fast_input,
            quant=cfg.quant, quant_min_ch=cfg.quant_min_ch,
            quant_clip=cfg.quant_clip, quant_skip=cfg.quant_skip,
        )
    raise ValueError(f"unknown model {cfg.name!r}; options: bisenet, deeplabv2")


def build_discriminator(cfg: ModelConfig, mesh_ctx=None):
    """FCDiscriminator; with a multi-shard ``mesh_ctx`` the Pallas conv1
    runs per data shard under shard_map (a bare pallas_call would be
    replicated by the SPMD partitioner)."""
    mesh = None
    data_axis = "data"
    if mesh_ctx is not None and mesh_ctx.num_data_shards > 1:
        mesh = mesh_ctx.mesh
        data_axis = mesh_ctx.data_axis
    return FCDiscriminator(
        num_classes=cfg.num_classes,
        ndf=cfg.disc_ndf,
        dtype=jnp.dtype(cfg.compute_dtype),
        mesh=mesh,
        data_axis=data_axis,
    )


def init_model(
    module, rng: jax.Array, input_shape: Tuple[int, ...], train: bool = True
) -> Dict[str, Any]:
    """Initialize variables ({'params', 'batch_stats'?}) with a dummy input.

    Initialization runs under ``jax.eval_shape``-friendly abstract tracing via
    ``module.init`` on a zeros input; weights follow each module's declared
    initializer (Kaiming / N(0, 0.01) / N(0, 0.02) — parity with the
    reference init schemes)."""
    import inspect

    dummy = jnp.zeros(input_shape, jnp.float32)
    # Modules without a train-mode switch (FCDiscriminator has no BN /
    # dropout, reference discriminator.py:25-60). Inspect the signature
    # rather than catching TypeError, which would also swallow genuine
    # errors raised inside tracing.
    params = inspect.signature(type(module).__call__).parameters
    if "train" in params or len(params) > 2:
        return module.init(rng, dummy, train)
    return module.init(rng, dummy)


def load_pretrained_backbone(variables: dict, path: str, model_name: str) -> dict:
    """Graft converted backbone weights into a fresh variable pytree.

    ``path`` is an .npz produced by ``cli/convert_torch_weights.py`` (the
    offline torch->flax converter; the reference loads torchvision pretrained
    weights at build time, ``build_contextpath.py:59-64`` /
    ``deeplabv2.py:174-188``)."""
    from .convert import load_npz_into_variables

    return load_npz_into_variables(variables, path, model_name)
