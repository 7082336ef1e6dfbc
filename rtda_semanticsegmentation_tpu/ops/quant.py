"""int8 post-training quantization primitives for the serving path.

The reference has no quantized inference (its serving story is the fp16
autocast eval pass, reference ``utils.py:342-375``); this is a TPU-native
addition: v5e's MXU runs s8 x s8 -> s32 at twice the bf16 rate, and the
chained-conv probe (``scripts/bench_int8_conv.py``) measured 1.7-1.9x faster
convs at the 128/256-channel BiSeNet shapes.

Scheme (standard static symmetric PTQ):

- **Weights**: per-output-channel symmetric int8, scale = maxabs/127 over
  (kh, kw, ci). Quantized on the fly from the f32 params inside the jitted
  forward — one elementwise pass over ~11M weights, noise next to the convs
  — so there is exactly one checkpoint format.
- **Activations**: per-tensor symmetric int8 with a *calibrated* scale:
  a calibration pass records a clip statistic of |x| at every quantized
  conv input into a ``quant_stats`` flax collection (see
  ``models/quantize.py``) — exact max, or an outlier-robust quantile when
  ``ModelConfig.quant_clip < 1.0`` (default 0.999; see :func:`calib_clip`).
  Symmetric quantization wastes the negative half-range on post-ReLU
  tensors (~7 effective bits) but needs no zero-point correction terms in
  the conv.
- **Accumulation** in int32 on the MXU; dequantize with the folded
  ``s_x * s_w[c]`` per-channel factor straight into the compute dtype, where
  the following BatchNorm scale/shift fuses with it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

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


def calib_clip(x: jnp.ndarray, q: float, max_samples: int = 1 << 20) -> jnp.ndarray:
    """Calibration clip statistic for one batch: scalar f32.

    ``q >= 1.0`` returns exact max|x| (the round-1 scheme). ``q < 1.0``
    returns the q-quantile of |x| over a strided subsample of at most
    ``max_samples`` elements — trained ReLU nets grow heavy-tailed
    activation outliers, and scaling int8 to the absolute max spends the
    8-bit budget on a handful of pixels (measured: argmax agreement vs
    bf16 drops to ~0.94 on trained BiSeNet weights with max-abs, recovers
    above the 0.99 serving gate with q=0.999). The subsample keeps the
    sort O(1M log 1M) regardless of activation size; at q=0.999 the tail
    still holds ~1000 samples, plenty for a stable estimate.
    """
    a = jnp.abs(x.astype(jnp.float32)).reshape(-1)
    if q >= 1.0:
        return jnp.max(a)
    step = max(1, a.shape[0] // max_samples)
    return jnp.quantile(a[::step], q)


def act_scale(absmax: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor activation scale from a calibrated max|x| (scalar f32)."""
    return jnp.maximum(absmax.astype(jnp.float32), _EPS) / 127.0


def quantize_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    in_absmax: jnp.ndarray,
    strides: Tuple[int, int],
    padding,
    dilation: Tuple[int, int] = (1, 1),
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """NHWC conv computed on the int8 MXU path, dequantized to ``out_dtype``.

    ``kernel`` is the f32 (kh, kw, ci, co) parameter; ``in_absmax`` the
    calibrated scalar max|x| for this conv's input. The quantize /
    dequantize steps are elementwise and fuse into the conv prologue /
    epilogue under XLA; only the dot itself runs in s8.
    """
    sx = act_scale(in_absmax)
    xq = quantize_act(x, sx)
    wq, sw = quantize_weight(kernel)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        strides,
        padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
