"""Torch checkpoint -> flax parameter conversion.

The reference gets pretrained backbones two ways: torchvision downloads
ResNet-18/101 ImageNet weights at model build (``build_contextpath.py:59-64``)
and DeepLabV2 loads a local caffe-style ``.pth`` with the first key component
stripped and ``strict=False`` (``deeplabv2.py:174-188``). This module is the
offline equivalent: it maps a torch ``state_dict`` onto our flax tree and
saves a flat ``.npz`` keyed by flax paths
(``params/context_path/resnet/stem/conv/kernel``, ``batch_stats/...``), which
:func:`load_npz_into_variables` grafts into freshly-initialized variables.

Layout conversion: torch conv weights are (O, I, kH, kW); flax kernels are
(kH, kW, I, O) — transposed here once, offline.
"""

from __future__ import annotations

import re
from typing import Dict, Iterator, Tuple

import numpy as np

_STAGE_BLOCKS = {18: (2, 2, 2, 2), 101: (3, 4, 23, 3)}


def _torch_resnet_key_map(depth: int) -> Iterator[Tuple[str, str]]:
    """(torch_key_prefix, flax_path_prefix) pairs for a torchvision ResNet.

    flax paths are relative to the ``resnet`` module of ``ResNetFeatures``.
    """
    yield "conv1", "stem/conv"
    yield "bn1", "stem/bn"
    blocks = _STAGE_BLOCKS[depth]
    n_convs = 2 if depth == 18 else 3
    for stage, n_blocks in enumerate(blocks, start=1):
        for b in range(n_blocks):
            for c in range(1, n_convs + 1):
                yield (
                    f"layer{stage}.{b}.conv{c}",
                    f"layer{stage}_{b}/conv{c}/conv",
                )
                yield (
                    f"layer{stage}.{b}.bn{c}",
                    f"layer{stage}_{b}/conv{c}/bn",
                )
            yield (
                f"layer{stage}.{b}.downsample.0",
                f"layer{stage}_{b}/downsample/conv",
            )
            yield (
                f"layer{stage}.{b}.downsample.1",
                f"layer{stage}_{b}/downsample/bn",
            )


_BN_PARTS = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def convert_resnet_state_dict(
    state: Dict[str, np.ndarray], depth: int, flax_root: str
) -> Dict[str, np.ndarray]:
    """Map a torchvision-style ResNet state_dict to flat flax-path arrays.

    ``flax_root`` is the dotted module path prefix of the ResNet inside the
    target model, e.g. ``context_path/resnet`` (BiSeNet) or ``resnet``
    (DeepLabV2). Unmatched torch keys (fc head, ASPP, num_batches_tracked)
    are skipped — the reference's ``strict=False`` semantics.
    """
    out: Dict[str, np.ndarray] = {}
    for torch_prefix, flax_prefix in _torch_resnet_key_map(depth):
        conv_key = f"{torch_prefix}.weight"
        if flax_prefix.endswith("/conv") and conv_key in state:
            w = np.asarray(state[conv_key])
            out[f"params/{flax_root}/{flax_prefix}/kernel"] = w.transpose(
                2, 3, 1, 0
            )
            continue
        if flax_prefix.endswith("/bn"):
            for part, (collection, name) in _BN_PARTS.items():
                k = f"{torch_prefix}.{part}"
                if k in state:
                    out[f"{collection}/{flax_root}/{flax_prefix}/{name}"] = (
                        np.asarray(state[k])
                    )
    return out


def strip_key_prefix(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop the first dotted component of every key (reference
    ``deeplabv2.py:181-186``, for caffe-style 'Scale.layer1...' checkpoints)."""
    return {k.split(".", 1)[1]: v for k, v in state.items() if "." in k}


def looks_prefixed(state: Dict[str, np.ndarray]) -> bool:
    return not any(
        k.startswith(("conv1.", "bn1.", "layer1.")) for k in state
    )


def convert_torch_checkpoint(
    state: Dict[str, np.ndarray], model_name: str, depth: int
) -> Dict[str, np.ndarray]:
    """Full conversion for a target model family."""
    state = {k: np.asarray(v) for k, v in state.items()}
    if looks_prefixed(state):
        state = strip_key_prefix(state)
    root = {"bisenet": "context_path/resnet", "deeplabv2": "resnet"}[model_name]
    return convert_resnet_state_dict(state, depth, root)


def load_npz_into_variables(variables: dict, path: str, model_name: str) -> dict:
    """Graft converted arrays into a freshly-initialized variables pytree.

    Shape-checked; unknown npz keys raise (they indicate a converter/model
    mismatch), missing model keys keep their fresh init (strict=False).
    """
    import flax

    arrays = np.load(path)
    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    loaded = 0
    for key in arrays.files:
        if key not in flat:
            raise KeyError(
                f"npz key {key!r} not found in {model_name} variables - "
                "wrong --model or a converter/model naming drift"
            )
        new = arrays[key]
        if flat[key].shape != new.shape:
            raise ValueError(
                f"shape mismatch for {key}: model {flat[key].shape} vs "
                f"checkpoint {new.shape}"
            )
        flat[key] = new.astype(flat[key].dtype)
        loaded += 1
    if loaded == 0:
        raise ValueError(f"{path} contains no loadable arrays")
    return flax.traverse_util.unflatten_dict(flat, sep="/")
