"""BiSeNet — the real-time two-path segmentation generator.

TPU-native re-design of reference ``models/bisenet/build_bisenet.py`` in NHWC
with bf16 MXU compute. Structure parity (channel widths, fusion topology,
upsample points) with the reference:

- Spatial path: 3x (3x3 stride-2 conv-BN-ReLU) 3->64->128->256 at 1/8
  (``build_bisenet.py:21-32``).
- Context path: ResNet-18/101 trunk emitting 1/16 and 1/32 features plus a
  global-average tail (``build_contextpath.py:18-29``).
- AttentionRefinementModule: GAP -> 1x1 conv -> BN -> sigmoid channel gate
  (``build_bisenet.py:35-53``); the 1/32 feature is then scaled by the tail.
- FeatureFusionModule: concat(spatial, context) -> ConvBlock(stride 1,
  -> num_classes) -> SE-style gate -> mul + add residual
  (``build_bisenet.py:56-81``).
- Aux supervision heads on the refined context features, upsampled to input
  size, returned only in training (``build_bisenet.py:154-168``). The
  reference computes them but never feeds them to a loss (all its train
  loops use outputs[0] only — ``train.py:113-120``); we keep the same
  output signature and the same "unused by default" semantics, with an
  optional aux-loss weight exposed in the train step for completeness.
- Final head: bilinear x8 upsample then 1x1 conv (``build_bisenet.py:164-165``).

Init parity: Kaiming-normal fan-in for non-backbone convs, BN gamma=1 beta=0,
eps 1e-5 momentum 0.1 (``build_bisenet.py:129-138``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    ConvBN,
    Dtype,
    FoldableBatchNorm,
    global_avg_pool,
    kaiming_normal_fan_in,
    resize_bilinear,
)
from .resnet import ContextPath


class SpatialPath(nn.Module):
    dtype: Dtype = jnp.bfloat16
    phase: int = 0  # multi-phase conv for the MXU-starved RGB conv (0 = off)
    quant: str = "none"
    quant_min_ch: int = 64
    quant_clip: float = 1.0
    quant_skip: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        # conv1 consumes 3-channel RGB — phase-conv it; conv2/conv3 at
        # >=64 channels measured no better in phase form
        # (scripts/bench_stem_phase_conv.py).
        for i, ch in enumerate((64, 128, 256)):
            x = ConvBN(
                ch, dtype=self.dtype, name=f"convblock{i + 1}",
                phase_factor=self.phase if i == 0 else 0,
                quant=self.quant, quant_min_ch=self.quant_min_ch,
                quant_clip=self.quant_clip, quant_skip=self.quant_skip,
            )(x, train)
        return x


class AttentionRefinementModule(nn.Module):
    """Channel attention: sigmoid(BN(conv1x1(GAP(x)))) * x."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = global_avg_pool(x, keepdims=True)
        g = nn.Conv(
            self.features, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=kaiming_normal_fan_in, name="conv",
        )(g)
        # FoldableBatchNorm (same variable tree as nn.BatchNorm) for torch
        # running-stat parity: this BN reduces ONLY the batch axis (N = B),
        # where torch's unbiased running-var update differs from the biased
        # batch var by B/(B-1) — far from negligible. Gate math at >=f32.
        g = FoldableBatchNorm(momentum=0.9, epsilon=1e-5, name="bn")(
            g.astype(jnp.promote_types(g.dtype, jnp.float32)),
            use_running_average=not train,
        )
        gate = nn.sigmoid(g).astype(self.dtype)
        return x * gate


class FeatureFusionModule(nn.Module):
    """Fuse spatial + context features with an SE-style residual gate."""

    num_classes: int
    dtype: Dtype = jnp.bfloat16
    quant: str = "none"
    quant_min_ch: int = 64
    quant_clip: float = 1.0
    quant_skip: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, sx, cx, train: bool = False):
        x = jnp.concatenate([sx, cx], axis=-1)
        feature = ConvBN(
            self.num_classes, (3, 3), (1, 1), dtype=self.dtype, name="convblock",
            quant=self.quant, quant_min_ch=self.quant_min_ch,
            quant_clip=self.quant_clip, quant_skip=self.quant_skip,
        )(x, train)
        g = global_avg_pool(feature, keepdims=True)
        g = nn.relu(
            nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype,
                param_dtype=jnp.float32, kernel_init=kaiming_normal_fan_in,
                name="conv1",
            )(g)
        )
        g = nn.sigmoid(
            nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype,
                param_dtype=jnp.float32, kernel_init=kaiming_normal_fan_in,
                name="conv2",
            )(g)
        ).astype(self.dtype)
        return feature * g + feature


class BiSeNet(nn.Module):
    """Bilateral Segmentation Network.

    ``__call__(x, train)`` takes NHWC float input; returns logits
    (B, H, W, num_classes) in eval, or (logits, aux1, aux2) in training with
    the aux heads upsampled to input size.
    """

    num_classes: int = 19
    context_path: str = "resnet18"  # resnet18 | resnet101
    dtype: Dtype = jnp.bfloat16
    # Compute the RGB-consuming stem convs in multi-phase coarse-stride form
    # (exact rearrangement, see layers.conv_phase). Off by default: measured
    # slower than the native stems in the full model on v5e
    # (scripts/bench_fast_input_ab.py).
    fast_input: bool = False
    # int8 PTQ serving path ('none' | 'calib' | 'int8'); convs with at least
    # quant_min_ch input channels run on the s8 MXU path after calibration
    # (models/quantize.py). Inference-only: train always uses 'none'.
    quant: str = "none"
    quant_min_ch: int = 64
    quant_clip: float = 1.0
    quant_skip: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False, upsample: bool = True):
        h, w = x.shape[1], x.shape[2]
        phase = 4 if self.fast_input else 0
        q = dict(
            quant=self.quant, quant_min_ch=self.quant_min_ch,
            quant_clip=self.quant_clip, quant_skip=self.quant_skip,
        )
        sx = SpatialPath(dtype=self.dtype, name="spatial_path", phase=phase, **q)(
            x, train
        )

        depth = {"resnet18": 18, "resnet101": 101}[self.context_path]
        cx1, cx2, tail = ContextPath(
            depth=depth, dtype=self.dtype, name="context_path",
            stem_phase=phase, **q,
        )(x, train)

        cx1 = AttentionRefinementModule(
            cx1.shape[-1], dtype=self.dtype, name="arm1"
        )(cx1, train)
        cx2 = AttentionRefinementModule(
            cx2.shape[-1], dtype=self.dtype, name="arm2"
        )(cx2, train)
        cx2 = cx2 * tail.astype(cx2.dtype)

        target = (sx.shape[1], sx.shape[2])
        cx1 = resize_bilinear(cx1, target)
        cx2 = resize_bilinear(cx2, target)
        cx = jnp.concatenate([cx1, cx2], axis=-1)

        if train:
            sup1 = nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype,
                param_dtype=jnp.float32, kernel_init=kaiming_normal_fan_in,
                name="supervision1",
            )(cx1)
            sup2 = nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype,
                param_dtype=jnp.float32, kernel_init=kaiming_normal_fan_in,
                name="supervision2",
            )(cx2)
            sup1 = resize_bilinear(sup1, (h, w))
            sup2 = resize_bilinear(sup2, (h, w))

        result = FeatureFusionModule(
            self.num_classes, dtype=self.dtype, name="ffm", **q
        )(sx, cx, train)

        # Reference order is upsample x8 then 1x1 conv (build_bisenet.py:
        # 164-165). A 1x1 conv and a bilinear resize are both linear maps on
        # disjoint axes (channels / space), so they commute exactly (the bias
        # passes through because interpolation weights sum to 1). Applying
        # the conv at 1/8 resolution does 64x less conv work and avoids a
        # second full-resolution 19-channel round trip through HBM.
        result = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=kaiming_normal_fan_in, name="final_conv",
        )(result)
        # upsample=False (eval only): return the 1/8-resolution logits — the
        # x8 bilinear field is exactly reproducible from these
        # (ops/upsample.py). Used by the serving-tail A/B study
        # (scripts/bench_fused_tail.py) and available to consumers that want
        # low-res outputs; the native resize+argmax tail measured FASTER on
        # v5e, so the default serving path keeps upsample=True.
        if not train and not upsample:
            return result
        result = resize_bilinear(result, (h, w))

        if train:
            return result, sup1, sup2
        return result
