"""ResNet feature backbones (NHWC, flax linen).

Serves two consumers with one implementation:

- BiSeNet's context path: torchvision-style ResNet-18 / ResNet-101 returning
  (feature 1/16, feature 1/32, global-average tail) — reference
  ``models/bisenet/build_contextpath.py:18-29``.
- DeepLabV2's dilated ResNet-101 trunk: caffe-style Bottleneck (stride on the
  first 1x1 conv), layer3 stride 1 dilation 2, layer4 stride 1 dilation 4,
  ceil-mode stem pool — reference ``models/deeplabv2/deeplabv2.py:7-101``.

"Frozen BN" parity note: the reference sets ``requires_grad=False`` on every
BN affine parameter of DeepLabV2 but leaves the layers in train mode (batch
statistics used, running stats updated). We reproduce exactly that: BN modules
behave normally here; the *optimizer* masks BN params out of the update (see
``train/optim.py``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, Dtype, global_avg_pool, he_normal_fan_out, max_pool_torch


class BasicBlock(nn.Module):
    """torchvision BasicBlock: two 3x3 convs + identity/projection residual."""

    filters: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16
    quant: str = "none"
    quant_min_ch: int = 64
    quant_clip: float = 1.0
    quant_skip: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = dict(
            quant=self.quant, quant_min_ch=self.quant_min_ch,
            quant_clip=self.quant_clip, quant_skip=self.quant_skip,
        )
        residual = x
        y = ConvBN(
            self.filters, (3, 3), (self.strides, self.strides),
            dtype=self.dtype, kernel_init=he_normal_fan_out, name="conv1", **q,
        )(x, train)
        y = ConvBN(
            self.filters, (3, 3), (1, 1), use_relu=False,
            dtype=self.dtype, kernel_init=he_normal_fan_out, name="conv2", **q,
        )(y, train)
        if self.strides != 1 or x.shape[-1] != self.filters:
            residual = ConvBN(
                self.filters, (1, 1), (self.strides, self.strides),
                padding=((0, 0), (0, 0)), use_relu=False,
                dtype=self.dtype, kernel_init=he_normal_fan_out, name="downsample", **q,
            )(x, train)
        return nn.relu(y + residual).astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (dilated) -> 1x1 (x4 expand) bottleneck with residual.

    ``stride_on_first`` selects the caffe/DeepLab stride placement (stride on
    the first 1x1 conv — reference ``deeplabv2.py:12``) vs the torchvision
    v1.5 placement (stride on the 3x3 conv). ``force_downsample`` reproduces
    the reference DeepLab rule that dilated stages always get a projection
    shortcut on their first block (``deeplabv2.py:92-101``).
    """

    filters: int
    strides: int = 1
    dilation: int = 1
    stride_on_first: bool = False
    force_downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    quant: str = "none"
    quant_min_ch: int = 64
    quant_clip: float = 1.0
    quant_skip: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = dict(
            quant=self.quant, quant_min_ch=self.quant_min_ch,
            quant_clip=self.quant_clip, quant_skip=self.quant_skip,
        )
        s1 = self.strides if self.stride_on_first else 1
        s2 = 1 if self.stride_on_first else self.strides
        out_ch = self.filters * 4
        d = self.dilation
        residual = x
        y = ConvBN(
            self.filters, (1, 1), (s1, s1), padding=((0, 0), (0, 0)),
            dtype=self.dtype, kernel_init=he_normal_fan_out, name="conv1", **q,
        )(x, train)
        y = ConvBN(
            self.filters, (3, 3), (s2, s2), padding=((d, d), (d, d)), dilation=d,
            dtype=self.dtype, kernel_init=he_normal_fan_out, name="conv2", **q,
        )(y, train)
        y = ConvBN(
            out_ch, (1, 1), (1, 1), padding=((0, 0), (0, 0)), use_relu=False,
            dtype=self.dtype, kernel_init=he_normal_fan_out, name="conv3", **q,
        )(y, train)
        if self.strides != 1 or x.shape[-1] != out_ch or self.force_downsample:
            residual = ConvBN(
                out_ch, (1, 1), (self.strides, self.strides),
                padding=((0, 0), (0, 0)), use_relu=False,
                dtype=self.dtype, kernel_init=he_normal_fan_out, name="downsample", **q,
            )(x, train)
        return nn.relu(y + residual).astype(self.dtype)


_STAGE_FILTERS = (64, 128, 256, 512)


class ResNetFeatures(nn.Module):
    """ResNet trunk emitting stage features (no classifier head).

    ``depth`` 18 => BasicBlock [2,2,2,2]; 101 => Bottleneck [3,4,23,3].
    ``output_stride`` 32 => plain torchvision strides (layers 3/4 stride 2);
    8 => DeepLab dilation trick (layer3 stride1/dil2, layer4 stride1/dil4).
    ``deeplab_style`` additionally switches to caffe stride placement and a
    ceil-mode stem pool.

    Returns (c3, c4): stage-3 and stage-4 feature maps.
    """

    depth: int = 18
    output_stride: int = 32
    deeplab_style: bool = False
    dtype: Dtype = jnp.bfloat16
    stem_phase: int = 0  # multi-phase factor for the RGB stem conv (0/1 = off)
    quant: str = "none"  # int8 serving path (see layers.QuantConv)
    quant_min_ch: int = 64
    quant_clip: float = 1.0
    quant_skip: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.depth == 18:
            layers, block_cls = (2, 2, 2, 2), BasicBlock
        elif self.depth == 101:
            layers, block_cls = (3, 4, 23, 3), Bottleneck
        else:
            raise ValueError(f"unsupported resnet depth {self.depth}")
        if block_cls is BasicBlock and self.output_stride != 32:
            # BasicBlock carries no dilation field; silently building
            # stride-1 UNdilated stages would collapse the receptive field
            # while claiming the DeepLab dilation trick.
            raise ValueError(
                f"output_stride={self.output_stride} needs dilated stages, "
                f"which only the Bottleneck (depth>=50) blocks implement"
            )

        x = ConvBN(
            64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
            dtype=self.dtype, kernel_init=he_normal_fan_out, name="stem",
            phase_factor=self.stem_phase,
        )(x, train)
        x = max_pool_torch(x, 3, 2, 1, ceil_mode=self.deeplab_style)

        if self.output_stride == 32:
            stage_cfg = ((1, 1), (2, 1), (2, 1), (2, 1))  # (stride, dilation)
        elif self.output_stride == 8:
            stage_cfg = ((1, 1), (2, 1), (1, 2), (1, 4))
        else:
            raise ValueError(f"unsupported output_stride {self.output_stride}")

        feats = []
        for stage, (num_blocks, (stride, dilation)) in enumerate(
            zip(layers, stage_cfg)
        ):
            for i in range(num_blocks):
                kwargs = dict(
                    filters=_STAGE_FILTERS[stage],
                    strides=stride if i == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                    quant=self.quant,
                    quant_min_ch=self.quant_min_ch,
                    quant_clip=self.quant_clip,
                    quant_skip=self.quant_skip,
                )
                if block_cls is Bottleneck:
                    kwargs.update(
                        dilation=dilation,
                        stride_on_first=self.deeplab_style,
                        force_downsample=(
                            self.deeplab_style and i == 0 and dilation > 1
                        ),
                    )
                x = block_cls(**kwargs)(x, train)
            feats.append(x)
        return feats[2], feats[3]


class ContextPath(nn.Module):
    """BiSeNet context path: ResNet features + global-average tail.

    Returns (c3 @1/16, c4 @1/32, tail) where tail is the (B,1,1,C) global
    average of c4 (reference ``build_contextpath.py:26-29``)."""

    depth: int = 18
    dtype: Dtype = jnp.bfloat16
    stem_phase: int = 0
    quant: str = "none"
    quant_min_ch: int = 64
    quant_clip: float = 1.0
    quant_skip: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3, c4 = ResNetFeatures(
            depth=self.depth, output_stride=32, dtype=self.dtype, name="resnet",
            stem_phase=self.stem_phase,
            quant=self.quant, quant_min_ch=self.quant_min_ch,
            quant_clip=self.quant_clip, quant_skip=self.quant_skip,
        )(x, train)
        tail = global_avg_pool(c4, keepdims=True)
        return c3, c4, tail
