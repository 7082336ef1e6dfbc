"""DeepLabV2 — the upper-bound segmentation model.

TPU-native NHWC re-design of reference ``models/deeplabv2/deeplabv2.py``:
dilated caffe-style ResNet-101 (Bottleneck [3,4,23,3], layer3 stride1/dil2,
layer4 stride1/dil4, ceil-mode stem pool) with an ASPP head of four parallel
3x3 convs at dilations [6,12,18,24] summed (``deeplabv2.py:48-64,82``) and a
bilinear resize of the logits to the input resolution (``deeplabv2.py:124``).

Head conv weights ~ N(0, 0.01) (``deeplabv2.py:58,83-85``). BN freezing is
handled by the optimizer mask (see ``models/resnet.py`` docstring).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import Dtype, normal_init, resize_bilinear
from .resnet import ResNetFeatures


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling: sum of parallel dilated 3x3 convs."""

    num_classes: int = 19
    dilations: tuple = (6, 12, 18, 24)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out = None
        for i, d in enumerate(self.dilations):
            y = nn.Conv(
                self.num_classes, (3, 3), strides=(1, 1),
                padding=((d, d), (d, d)), kernel_dilation=(d, d), use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=normal_init(0.01), name=f"branch{i}",
            )(x)
            out = y if out is None else out + y
        return out


class DeepLabV2(nn.Module):
    """Dilated ResNet-101 + ASPP. Returns (B, H, W, num_classes) logits.

    For interface uniformity with BiSeNet, training mode returns
    ``(logits, None, None)`` (parity: reference ``deeplabv2.py:126-129``).
    """

    num_classes: int = 19
    dtype: Dtype = jnp.bfloat16
    fast_input: bool = False  # phase-conv RGB stem (exact; see layers.conv_phase)
    quant: str = "none"  # int8 PTQ serving path (see models/quantize.py)
    quant_min_ch: int = 64
    quant_clip: float = 1.0
    quant_skip: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False, upsample: bool = True):
        h, w = x.shape[1], x.shape[2]
        _, c4 = ResNetFeatures(
            depth=101, output_stride=8, deeplab_style=True,
            dtype=self.dtype, name="resnet",
            stem_phase=4 if self.fast_input else 0,
            quant=self.quant, quant_min_ch=self.quant_min_ch,
            quant_clip=self.quant_clip, quant_skip=self.quant_skip,
        )(x, train)
        logits = ASPP(self.num_classes, dtype=self.dtype, name="aspp")(c4)
        # upsample=False (eval only): 1/8-resolution logits (exactly
        # reconstructible to full res — ops/upsample.py; the native
        # resize+argmax tail measured faster on v5e, so this is opt-in).
        if not train and not upsample:
            return logits
        logits = resize_bilinear(logits, (h, w))
        if train:
            return logits, None, None
        return logits
