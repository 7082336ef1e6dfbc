"""Shared NHWC building blocks for the model zoo.

TPU-first conventions used throughout the models:

- NHWC activation layout (the layout XLA prefers on TPU; the reference is
  NCHW torch, e.g. ``build_bisenet.py``).
- convolutions compute in a configurable dtype (bf16 by default) with f32
  parameters; BatchNorm statistics and affine transform run in f32 for
  numerical stability, output cast back to the compute dtype. XLA fuses the
  BN + activation into the convolution epilogue.
- explicit conv padding matching torch's arithmetic (out = floor((H+2p-k)/s)+1).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# torch nn.init.kaiming_normal_(mode='fan_in', nonlinearity='relu')
kaiming_normal_fan_in = nn.initializers.variance_scaling(
    2.0, "fan_in", "normal"
)
# torch default conv init used by torchvision resnets when training de novo
he_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def normal_init(stddev: float):
    return nn.initializers.normal(stddev=stddev)


class FoldableBatchNorm(nn.Module):
    """BatchNorm with f32 statistics and a compute-dtype application path.

    Drop-in for ``nn.BatchNorm`` (same variable names: params scale/bias,
    batch_stats mean/var — checkpoints and the torch weight converter see an
    identical tree), with two TPU-minded differences:

    - Train: batch mean/var are accumulated in f32 (bf16 reductions over
      millions of pixels are numerically unsafe), but the normalization is
      applied as a per-channel scale/shift in the *input* dtype, so the
      activation map never round-trips through f32 HBM traffic.
    - Eval: running stats + affine fold into one scale/shift pair computed
      in f32 on (C,)-vectors and applied in the input dtype — algebraically
      identical to flax BN, at half the memory traffic for bf16 activations.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            # At-least-f32 statistics: f32 for the production f32/bf16
            # paths, f64 under jax_enable_x64 (lets parity tests compare
            # against a float64 torch oracle without f32 truncation here).
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                # torch parity: normalization uses the biased batch var, but
                # the running average tracks the UNBIASED one (factor
                # N/(N-1)). Material for BNs over few samples — the ARM/FFM
                # gate BNs reduce only the batch axis (N = B), where the
                # biased estimate is off by 1/(B-1).
                n = np.prod([x.shape[a] for a in axes])
                correction = n / max(n - 1, 1)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var * correction
                )

        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        mul = inv.astype(x.dtype)
        add = (bias - mean * inv).astype(x.dtype)
        return x * mul + add


def conv_phase(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int,
    pad: int,
    phase: int = 4,
    compute_dtype: Optional[Dtype] = None,
) -> jnp.ndarray:
    """2-D conv computed as one coarse-stride multi-phase conv — exact
    equivalent of ``lax.conv_general_dilated(x, w, (stride, stride),
    ((pad, pad), (pad, pad)))`` in NHWC.

    Why: convs whose channel counts are far below the MXU's 128 lanes (the
    RGB stem: ci=3, co=64) run at <15% MXU utilization under XLA's conv
    emitter (measured 10-29 TFLOP/s on v5e vs 111-124 at >=128 channels,
    ``scripts/bench_conv_marginal.py``). This computes ``phase`` x ``phase``
    consecutive outputs per conv window position: the original (kh, kw, ci,
    co) kernel is zero-scattered into a ((phase-1)*stride + kh, ..., ci,
    phase^2*co) kernel applied at stride ``phase*stride``, then the phase
    groups are interleaved back with a depth-to-space (which XLA fuses into
    the conv epilogue — measured free). The contraction gets kp^2*ci deep
    and the output phase^2*co wide — both MXU-friendly — at the price of
    the zero-tap FLOPs. Every original multiply-add is present; extra taps
    multiply zero weights, so the result is exact up to f32 accumulation
    order.

    Note: an explicit space-to-depth *input* packing was tried first and is
    ~3x SLOWER than the native conv on v5e — the 6-D pack/unpack transposes
    on few-channel data are catastrophic relayouts. This formulation never
    touches the input layout.
    """
    kh, kw, ci, co = w.shape
    b_, h, w_, c = x.shape
    assert c == ci
    kp_h = (phase - 1) * stride + kh
    kp_w = (phase - 1) * stride + kw
    sp = phase * stride
    hout = (h + 2 * pad - kh) // stride + 1
    wout = (w_ + 2 * pad - kw) // stride + 1
    # The coarse conv must tile the output exactly into phase groups.
    assert hout % phase == 0 and wout % phase == 0, (hout, wout, phase)
    assert (h + 2 * pad - kp_h) // sp + 1 == hout // phase
    assert (w_ + 2 * pad - kp_w) // sp + 1 == wout // phase
    wp = jnp.zeros((kp_h, kp_w, ci, phase * phase * co), w.dtype)
    for a in range(phase):
        for b in range(phase):
            o = (a * phase + b) * co
            wp = wp.at[
                a * stride : a * stride + kh,
                b * stride : b * stride + kw,
                :,
                o : o + co,
            ].set(w)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wp = wp.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x,
        wp,
        (sp, sp),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ho, wo = hout // phase, wout // phase
    return (
        y.reshape(b_, ho, wo, phase, phase, co)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b_, hout, wout, co)
    )


class _PhaseConv(nn.Module):
    """Bias-free conv evaluated in multi-phase coarse-stride form.

    Parameter tree is identical to ``nn.Conv(name=...)`` (a single
    ``kernel`` of shape (kh, kw, ci, co)), so checkpoints, the torch weight
    converter, and param-tree tests are unaffected by the compute-path swap.
    Falls back to the plain conv when the static shape doesn't satisfy the
    phase-tiling divisibility constraints (decided at trace time).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    phase: int = 4
    dtype: Dtype = jnp.bfloat16
    kernel_init: Callable = kaiming_normal_fan_in

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        s = self.strides[0]
        pad = self.padding[0][0]
        f = self.phase
        symmetric = (
            self.strides[0] == self.strides[1]
            and all(p == pad for pair in self.padding for p in pair)
        )
        if symmetric:
            hout = (x.shape[1] + 2 * pad - kh) // s + 1
            wout = (x.shape[2] + 2 * pad - kw) // s + 1
            tiles = (
                hout % f == 0
                and wout % f == 0
                and (x.shape[1] + 2 * pad - ((f - 1) * s + kh)) // (f * s) + 1
                == hout // f
                and (x.shape[2] + 2 * pad - ((f - 1) * s + kw)) // (f * s) + 1
                == wout // f
            )
            if tiles:
                return conv_phase(
                    x, kernel, s, pad, f, compute_dtype=self.dtype
                )
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            self.strides,
            self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class QuantConv(nn.Module):
    """Bias-free conv with int8 post-training quantization (serving path).

    Parameter tree is identical to ``nn.Conv(name=...)`` (one f32 ``kernel``),
    so train/eval checkpoints load unchanged. Two modes:

    - ``calib``: runs the normal compute-dtype conv while recording a
      per-input-channel clip statistic of |input| into the mutable
      ``quant_stats`` collection (max-merged across calibration batches).
    - ``int8``: quantizes the input per-input-channel with the calibrated
      scales (exactly folded into the kernel) and the folded kernel
      per-output-channel, convolves s8 x s8 -> s32 on the MXU, dequantizes
      into the compute dtype (see ``ops/quant.py``). Requires a prior
      calibration pass (``models/quantize.py::calibrate``).
    - ``freeze``: one-time pass (``models/quantize.py::freeze``) that
      precomputes the int8 serving constants (quantized kernel, dequant
      scale, combined zero-point + bias correction) into a mutable
      ``quant_frozen`` collection, then runs the normal compute-dtype conv.
    - ``int8_frozen``: the int8 path against the frozen constants — only
      the activation quantize runs per forward. Identical arithmetic to
      ``int8``; ~17% faster at batch 128 (the per-forward weight work is
      batch-independent; BENCH r4).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    dilation: int = 1
    mode: str = "calib"  # calib | int8
    dtype: Dtype = jnp.bfloat16
    kernel_init: Callable = kaiming_normal_fan_in
    # Activation-scale clip quantile: 1.0 = exact per-channel max|x|; q < 1.0
    # clips to the q-quantile of |x| (ops/quant.py::calib_clip_channels).
    # Default is the exact max: with PER-CHANNEL scales, quantile clipping
    # LOSES fidelity on trained weights (0.9545 @ 0.999 vs 0.9720 @ 1.0,
    # scripts/probe_int8_layers.py) — the outliers it guarded against were
    # cross-channel heterogeneity, which per-channel scales already absorb.
    clip: float = 1.0

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import (
            calib_clip_channels,
            freeze_weights,
            int8_conv,
            int8_conv_frozen,
        )

        kh, kw = self.kernel_size
        ci = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, ci, self.features),
            jnp.float32,
        )
        stat = self.variable(
            "quant_stats", "in_absmax", lambda: jnp.zeros((ci,), jnp.float32)
        )
        # per-channel E[x] for the weight-rounding bias correction
        # (ops/quant.py module docstring); equal-weight running mean over
        # calibration batches alongside a batch counter
        mean_stat = self.variable(
            "quant_stats", "in_mean", lambda: jnp.zeros((ci,), jnp.float32)
        )
        count = self.variable(
            "quant_stats", "calib_batches", lambda: jnp.zeros((), jnp.float32)
        )
        d = (self.dilation, self.dilation)
        if self.mode == "calib":
            if not self.is_initializing():
                stat.value = jnp.maximum(
                    stat.value, calib_clip_channels(x, self.clip)
                )
                bmean = jnp.mean(x.astype(jnp.float32), axis=tuple(range(x.ndim - 1)))
                n = count.value
                mean_stat.value = (mean_stat.value * n + bmean) / (n + 1.0)
                count.value = n + 1.0
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                self.strides,
                self.padding,
                rhs_dilation=d,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.mode in ("freeze", "int8_frozen"):
            co = self.features
            wq_v = self.variable(
                "quant_frozen", "wq",
                lambda: jnp.zeros((kh, kw, ci, co), jnp.int8),
            )
            sw_v = self.variable(
                "quant_frozen", "sw", lambda: jnp.ones((co,), jnp.float32)
            )
            c_v = self.variable(
                "quant_frozen", "c", lambda: jnp.zeros((co,), jnp.float32)
            )
            if self.mode == "freeze":
                if not self.is_initializing():
                    wq_v.value, sw_v.value, c_v.value = freeze_weights(
                        kernel, stat.value, mean_stat.value
                    )
                # propagate real activations so downstream convs freeze
                # against their actual input statistics' shapes
                return jax.lax.conv_general_dilated(
                    x.astype(self.dtype),
                    kernel.astype(self.dtype),
                    self.strides,
                    self.padding,
                    rhs_dilation=d,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            return int8_conv_frozen(
                x,
                wq_v.value,
                sw_v.value,
                c_v.value,
                stat.value,
                self.strides,
                self.padding,
                dilation=d,
                out_dtype=self.dtype,
            )
        assert self.mode == "int8", self.mode
        # unsigned=True: every quantized conv in these models consumes a
        # post-ReLU (or ReLU*gate) tensor, x >= 0 — the RGB stems that see
        # signed normalized input are excluded by quant_min_ch. The affine
        # unsigned grid buys one effective bit (ops/quant.py).
        return int8_conv(
            x,
            kernel,
            stat.value,
            self.strides,
            self.padding,
            dilation=d,
            out_dtype=self.dtype,
            unsigned=True,
            in_mean=mean_stat.value,
        )


class ConvBN(nn.Module):
    """Conv (no bias) -> BatchNorm -> optional ReLU.

    Parity: reference ``ConvBlock`` (``build_bisenet.py:9-19``) with
    BN eps 1e-5, momentum 0.1 (torch) == 0.9 (flax convention).

    ``phase_factor > 1`` computes the conv in multi-phase coarse-stride form
    (exact rearrangement — see :func:`conv_phase`); used for the RGB-input
    stems whose 3-channel contraction starves the MXU.

    ``quant`` ('none' | 'calib' | 'int8') switches the conv onto the int8
    serving path (:class:`QuantConv`) when the input has at least
    ``quant_min_ch`` channels — few-channel convs (the RGB stems) are
    layout-bound, not MXU-bound, and gain nothing from s8. All three modes
    share one parameter tree.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (2, 2)
    padding: Any = ((1, 1), (1, 1))
    dilation: int = 1
    use_relu: bool = True
    dtype: Dtype = jnp.bfloat16
    kernel_init: Callable = kaiming_normal_fan_in
    phase_factor: int = 0
    quant: str = "none"  # none | calib | int8
    quant_min_ch: int = 64
    quant_clip: float = 1.0  # activation clip quantile (QuantConv.clip)
    # bound-path substrings that keep this conv on the bf16 path even in
    # calib/int8 mode (ModelConfig.quant_skip): logits-adjacent convs are
    # the argmax-fidelity bottleneck (scripts/probe_int8_layers.py)
    quant_skip: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        path = "/".join(self.path)
        quantize = (
            self.quant != "none"
            and x.shape[-1] >= self.quant_min_ch
            and not any(pat in path for pat in self.quant_skip)
        )
        if quantize:
            x = QuantConv(
                self.features,
                self.kernel_size,
                self.strides,
                self.padding,
                dilation=self.dilation,
                mode=self.quant,
                dtype=self.dtype,
                kernel_init=self.kernel_init,
                clip=self.quant_clip,
                name="conv",
            )(x)
        elif self.phase_factor > 1 and self.dilation == 1:
            x = _PhaseConv(
                self.features,
                self.kernel_size,
                self.strides,
                self.padding,
                phase=self.phase_factor,
                dtype=self.dtype,
                kernel_init=self.kernel_init,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                self.kernel_size,
                strides=self.strides,
                padding=self.padding,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=self.kernel_init,
                name="conv",
            )(x)
        x = FoldableBatchNorm(momentum=0.9, epsilon=1e-5, name="bn")(
            x, use_running_average=not train
        )
        if self.use_relu:
            x = nn.relu(x)
        return x.astype(self.dtype)


def max_pool_torch(
    x: jnp.ndarray,
    window: int,
    strides: int,
    padding: int,
    ceil_mode: bool = False,
) -> jnp.ndarray:
    """Max pool with torch semantics, incl. ``ceil_mode``.

    torch's ceil_mode rounds the output size up; equivalent to extra
    right/bottom -inf padding of ``(out_ceil-1)*s + k - (n + 2p)``. Needed by
    DeepLabV2's stem pool (reference ``deeplabv2.py:77``: MaxPool2d(3, 2, 1,
    ceil_mode=True))."""
    n_h, n_w = x.shape[1], x.shape[2]

    def out_size(n: int) -> int:
        eff = n + 2 * padding - window
        out = -(-eff // strides) + 1 if ceil_mode else eff // strides + 1
        # torch drops a ceil-mode window that would start entirely inside
        # the right padding (ATen pooling_output_shape: if (out-1)*s >=
        # n + p, out -= 1) — without this, some shapes grow an extra
        # all--inf output row/column.
        if ceil_mode and (out - 1) * strides >= n + padding:
            out -= 1
        return out

    # NOTE: a pair-packed slicing formulation of the 3x3/2 pool was tried
    # and measured SLOWER than reduce_window on v5e (0.98 vs 0.77 ms at
    # (4,256,512,64)) — the reshape-slices are strided relayouts. Keep the
    # native reduce_window.
    def extra(n: int) -> int:
        return (out_size(n) - 1) * strides + window - (n + 2 * padding)

    pads = (
        (0, 0),
        (padding, padding + max(extra(n_h), 0)),
        (padding, padding + max(extra(n_w), 0)),
        (0, 0),
    )
    # -inf (not finfo.min) so XLA recognizes the max monoid and the op gets
    # a reverse-mode autodiff rule (select-and-scatter).
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, strides, strides, 1),
        padding=pads,
    )


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """Mean over H, W in >=f32 (large spatial reductions are unsafe in bf16)."""
    acc = jnp.promote_types(x.dtype, jnp.float32)
    y = jnp.mean(x.astype(acc), axis=(1, 2), keepdims=keepdims)
    return y.astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize to (H, W) with half-pixel centers.

    Matches torch ``F.interpolate(mode='bilinear', align_corners=False)``
    used throughout the reference (``build_bisenet.py:150-158,164``).
    Computed in the input dtype: the x8 logits upsample at 1024x512 writes
    1.3 GB in f32 vs 0.65 GB in bf16, and interpolation is a convex
    combination — bf16-safe."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    b = x.shape[0]
    trailing = x.shape[3:] if x.ndim > 3 else ()
    return jax.image.resize(x, (b, size[0], size[1], *trailing), method="nearest")
