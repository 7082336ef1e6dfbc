"""int8 post-training quantization primitives for the serving path.

The reference has no quantized inference (its serving story is the fp16
autocast eval pass, reference ``utils.py:342-375``); this is a TPU-native
addition: v5e's MXU runs s8 x s8 -> s32 at twice the bf16 rate, and the
chained-conv probe (``scripts/bench_int8_conv.py``) measured 1.7-1.9x faster
convs at the 128/256-channel BiSeNet shapes.

Scheme (static symmetric PTQ, per-channel on BOTH operands):

- **Activations**: per-INPUT-CHANNEL symmetric int8. Trained ReLU nets grow
  strongly heterogeneous per-channel magnitudes (measured: one global scale
  left argmax agreement at ~0.90 on trained BiSeNet weights — channels 8x
  below the global clip quantize to a handful of codes); a per-channel scale
  is *exactly foldable* into the conv because the contraction runs over the
  channel axis: ``conv(x, w) == conv(x / s[ci], w * s[ci])``. The fold
  costs one broadcast multiply on each operand, fused into the conv
  prologue. Scales come from a calibration pass recording a per-channel
  clip statistic of |x| into a ``quant_stats`` flax collection (see
  ``models/quantize.py``) — exact max, or an outlier-robust quantile when
  ``ModelConfig.quant_clip < 1.0`` (default 1.0 = exact max; :func:`calib_clip`).
- **Weights**: per-output-channel symmetric int8 over the channel-folded
  kernel ``w * s[ci]``, scale = maxabs/127 over (kh, kw, ci). Quantized on
  the fly from the f32 params inside the jitted forward — one elementwise
  pass over ~11M weights, noise next to the convs — so there is exactly one
  checkpoint format.
- **Accumulation** in int32 on the MXU; dequantize with the per-output
  -channel ``s_w[co]`` factor (the activation scale cancelled in the fold)
  straight into the compute dtype, where the following BatchNorm
  scale/shift fuses with it.

- **Unsigned activation range** (``unsigned=True``, the model path): every
  quantized conv in these nets consumes a post-ReLU (or gated-ReLU) tensor,
  x >= 0, so the symmetric signed grid would waste its negative half (~7
  effective bits). Instead x maps affinely onto the full s8 grid with the
  zero-point at code -127: ``q = round(x / s) - 127`` with ``s = m/254``.
  The shift is corrected EXACTLY in integer arithmetic:
  ``conv(q + 127, wq) = conv_s8(q, wq) + 127 * sum(wq)`` per output channel
  — provided the spatial padding pads the *zero code* (-127), which is done
  by explicit pre-padding + a VALID conv. One extra effective bit halves
  the rounding noise of every quantized activation (measured: argmax
  agreement on trained weights 0.966 -> see PERFORMANCE.md).
- **Weight-rounding bias correction** (``in_mean``): rounding the folded
  kernel to the s8 grid leaves a deterministic residual
  ``e = w_folded - wq * sw``; convolved with the (non-negative, post-ReLU)
  input it shifts every output channel's mean by
  ``sum_{kh,kw,ci} E[x/s][ci] * e[..., ci, co]`` — a bias the following
  BatchNorm (whose shift is frozen at its f32 value) cannot absorb. With a
  calibrated per-channel input mean the shift is computed in closed form
  and subtracted (Nagel et al. 2019, data-free quantization, eq. 13 —
  public technique). Interior pixels see the full receptive field, edge
  pixels a cropped one; like the original method the correction uses the
  full-field expectation (the edge ring is a vanishing fraction at these
  resolutions).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


def weight_scales(kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel symmetric scale, shape (co,) f32."""
    absmax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=(0, 1, 2))
    return jnp.maximum(absmax, _EPS) / 127.0


def quantize_weight(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(int8 kernel, per-channel scale (co,) f32)."""
    sw = weight_scales(kernel)
    q = jnp.round(kernel.astype(jnp.float32) / sw)
    return jnp.clip(q, -127, 127).astype(jnp.int8), sw


def _coprime_stride(n: int, c: int, max_samples: int) -> int:
    """Subsample stride coprime with the channel axis: a power-of-two stride
    over a flattened NHWC tensor with power-of-two channels samples only
    C/step of the channels — with heterogeneous per-channel magnitudes that
    biases quantile estimates badly (observed 2.4x-too-small scales -> mass
    int8 saturation; r2 advisor finding)."""
    step = max(1, n // max_samples)
    if step > 1:
        step |= 1  # odd: coprime with every power-of-two layout
        while math.gcd(step, c) != 1:
            step += 2
    return step


def calib_clip(x: jnp.ndarray, q: float, max_samples: int = 1 << 20) -> jnp.ndarray:
    """Per-tensor calibration clip statistic for one batch: scalar f32.

    ``q >= 1.0`` returns exact max|x|; ``q < 1.0`` returns the q-quantile of
    |x| over a channel-unbiased strided subsample of at most ``max_samples``
    elements. The subsample keeps the sort O(1M log 1M) regardless of
    activation size; at q=0.999 the tail still holds ~1000 samples.
    """
    a = jnp.abs(x.astype(jnp.float32)).reshape(-1)
    if q >= 1.0:
        return jnp.max(a)
    c = x.shape[-1] if x.ndim > 0 else 1
    step = _coprime_stride(a.shape[0], c, max_samples)
    return jnp.quantile(a[::step], q)


def calib_clip_channels(
    x: jnp.ndarray, q: float, max_samples: int = 1 << 20
) -> jnp.ndarray:
    """Per-INPUT-CHANNEL calibration clip statistic: (ci,) f32.

    Same semantics as :func:`calib_clip` but computed per trailing-axis
    channel (the statistic behind the channel-folded activation scales).
    Subsampling strides over whole pixels (rows of the (P, C) view), so
    every channel is sampled at every kept pixel.
    """
    c = x.shape[-1]
    a = jnp.abs(x.astype(jnp.float32)).reshape(-1, c)
    if q >= 1.0:
        return jnp.max(a, axis=0)
    step = max(1, a.shape[0] // max(1, max_samples // c))
    return jnp.quantile(a[::step], q, axis=0)


def act_scale(absmax: jnp.ndarray, unsigned: bool = False) -> jnp.ndarray:
    """Activation scale(s) from calibrated clip stat: scalar or (ci,) f32.

    ``unsigned`` spreads the non-negative range [0, m] over all 254 steps
    of the s8 grid (zero-point handled in :func:`int8_conv`) instead of
    symmetric ±m over 127.
    """
    denom = 254.0 if unsigned else 127.0
    return jnp.maximum(absmax.astype(jnp.float32), _EPS) / denom


def quantize_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """``scale`` broadcasts over the trailing (channel) axis."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def freeze_weights(
    kernel: jnp.ndarray,
    in_absmax: jnp.ndarray,
    in_mean: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Precompute the unsigned-path int8 serving constants ONCE.

    Returns ``(wq s8 (kh,kw,ci,co), sw f32 (co,), c f32 (co,))`` such that
    the serving conv is just ``conv_s8(xq, wq) * sw + c`` — everything
    :func:`int8_conv` recomputes per forward (channel fold, weight
    quantization, zero-point sum, weight-rounding bias correction) folded
    into weight-space constants at calibration time. Arithmetic is
    identical to ``int8_conv(..., unsigned=True, in_mean=...)``:

      out = (y + 127*sum(wq)) * sw + bias_corr
          = y*sw + (127*sum(wq)*sw + bias_corr)  ==  y*sw + c

    Measured motivation: the per-forward weight work is batch-independent
    (~11M params x several elementwise passes + einsum per conv) and cost
    ~17% of int8 serving throughput at batch 128 (BENCH r4).
    """
    sx = act_scale(in_absmax, unsigned=True)
    folded = kernel.astype(jnp.float32) * (
        sx if sx.ndim == 0 else sx[None, None, :, None]
    )
    wq, sw = quantize_weight(folded)
    w_err = folded - wq.astype(jnp.float32) * sw
    r_mean = jnp.broadcast_to(
        in_mean.astype(jnp.float32) / sx, (kernel.shape[2],)
    )
    bias_corr = jnp.einsum("hwio,i->o", w_err, r_mean)
    zp = 127.0 * jnp.sum(wq.astype(jnp.float32), axis=(0, 1, 2))
    return wq, sw, zp * sw + bias_corr


def quantize_act_unsigned(x: jnp.ndarray, in_absmax: jnp.ndarray) -> jnp.ndarray:
    """Value -> s8 codes on the unsigned grid (zero-point at code -127).

    ``q = round(x / s) - 127`` with ``s = m/254`` — requires x >= 0
    (negatives clamp to the zero code)."""
    sx = act_scale(in_absmax, unsigned=True)
    q = jnp.round(x.astype(jnp.float32) / sx) - 127.0
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def pad_zero_code(xq: jnp.ndarray, padding) -> jnp.ndarray:
    """Spatially pad s8 codes with the unsigned grid's zero code (-127)."""
    if isinstance(padding, str):
        raise ValueError(
            "unsigned int8 conv needs explicit padding tuples (the pad "
            f"value is the zero code), got {padding!r}"
        )
    if any(p != 0 for pair in padding for p in pair):
        xq = jnp.pad(
            xq,
            ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0)),
            constant_values=np.int8(-127),
        )
    return xq


def int8_conv_frozen(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    sw: jnp.ndarray,
    c: jnp.ndarray,
    in_absmax: jnp.ndarray,
    strides: Tuple[int, int],
    padding,
    dilation: Tuple[int, int] = (1, 1),
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Unsigned int8 conv against :func:`freeze_weights` constants.

    Only the activation quantize/pad runs per forward; the weight-space
    work was folded into ``(wq, sw, c)`` at freeze time. Bit-identical
    math to ``int8_conv(..., unsigned=True, in_mean=...)`` (which calls
    this same core against freshly-computed constants)."""
    xq = pad_zero_code(quantize_act_unsigned(x, in_absmax), padding)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        strides,
        ((0, 0), (0, 0)),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * sw + c).astype(out_dtype)


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    in_absmax: jnp.ndarray,
    strides: Tuple[int, int],
    padding,
    dilation: Tuple[int, int] = (1, 1),
    out_dtype=jnp.bfloat16,
    unsigned: bool = False,
    in_mean: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """NHWC conv computed on the int8 MXU path, dequantized to ``out_dtype``.

    ``kernel`` is the f32 (kh, kw, ci, co) parameter; ``in_absmax`` the
    calibrated clip stat for this conv's input — scalar (per-tensor) or
    (ci,) (per-channel, the default scheme). Per-channel scales fold
    EXACTLY into the weight (``conv(x, w) == conv(x/s[ci], w*s[ci])``), so
    the dequant factor is per-output-channel only. The quantize / fold /
    dequantize steps are elementwise and fuse into the conv prologue /
    epilogue under XLA; only the dot itself runs in s8.

    ``unsigned=True`` (requires x >= 0, i.e. post-ReLU inputs; negatives
    clamp to 0): maps [0, m] affinely onto the full [-127, 127] grid
    (zero-point at -127) for one extra effective bit, with the shift
    corrected exactly via ``127 * sum(wq)`` per output channel and
    zero-code (-127) explicit padding. Requires explicit padding tuples.

    ``in_mean`` (optional, (ci,) or scalar f32): calibrated per-channel
    E[x]; enables the closed-form weight-rounding bias correction (module
    docstring) — adds the expected shortfall
    ``sum(E[x/s] * (w_folded - wq*sw))`` per output channel after
    dequantization.
    """
    if unsigned:
        # Identical math to the frozen path — literally the same code:
        # fold/quantize/zero-point/bias-correct via freeze_weights, then
        # the shared frozen conv core. An in_mean of zeros makes the bias
        # correction exactly 0 (the einsum contracts against it).
        zero_mean = jnp.zeros((kernel.shape[2],), jnp.float32)
        wq, sw, c = freeze_weights(
            kernel, in_absmax, zero_mean if in_mean is None else in_mean
        )
        return int8_conv_frozen(
            x, wq, sw, c, in_absmax, strides, padding,
            dilation=dilation, out_dtype=out_dtype,
        )

    sx = act_scale(in_absmax, unsigned=False)
    folded = kernel.astype(jnp.float32) * (
        sx if sx.ndim == 0 else sx[None, None, :, None]
    )
    wq, sw = quantize_weight(folded)
    bias_corr = None
    if in_mean is not None:
        r_mean = jnp.broadcast_to(
            in_mean.astype(jnp.float32) / sx, (kernel.shape[2],)
        )
        w_err = folded - wq.astype(jnp.float32) * sw
        # (kh, kw, ci, co) x (ci,) -> (co,): expected per-output-channel
        # shift from weight rounding, in output units
        bias_corr = jnp.einsum("hwio,i->o", w_err, r_mean)
    xq = quantize_act(x, sx)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        strides,
        padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * sw
    if bias_corr is not None:
        out = out + bias_corr
    return out.astype(out_dtype)
