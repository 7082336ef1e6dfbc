"""Phase-decomposed integer-factor bilinear upsample + argmax.

Every inference consumer of the segmentation head (the eval confusion
matrix, ``cli/predict.py``, the bench loop) computes
``argmax(resize_bilinear(logits_1/8, (H, W)), -1)`` — the reference does the
same on the model's full-resolution output (``validation.py:95``). The idea
here was to skip materializing the (B, H, W, C) logits in HBM (20 MB/image
at 1024x512x19 bf16) by phase-decomposing the resize: with half-pixel
centers, output pixel ``i*f + p`` interpolates source rows ``i + floor(a_p)``
and ``i + floor(a_p) + 1`` with a *phase-constant* weight
``a_p = (p + 0.5)/f - 0.5``, so each phase is two shifted views of the
(edge-padded) source scaled by scalars — no gathers, no resize weight
matrices — and the final W-phase arithmetic could fuse into the argmax
reduction. Edge behavior matches ``jax.image.resize`` exactly: its kernel
renormalization at the borders is algebraically identical to clamp-to-edge
for a 2-tap triangle kernel, and the interpolated VALUES are tested equal
to 1e-5.

**Measured on v5e: this LOSES — do not put it on the serving path.**
XLA materializes the stacked phase tensor in f32 instead of fusing it
(BiSeNet b32 bf16 serving: 537 img/s vs 1154 native), and the total tail
budget a perfect fusion could reclaim is small anyway: replacing the whole
x8-upsample+argmax with a low-res argmax (the floor) is only 5% of the
serving iteration at b32 and 8% at b128 — and ~half of THAT is intrinsic
full-resolution argmax compute (~19 compare/selects per output pixel) no
kernel can avoid. A Pallas kernel was sized and rejected on these numbers
(`scripts/bench_fused_tail.py`; PERFORMANCE.md "Fused upsample+argmax").
Kept as the tested reference formulation + for hosts where memory traffic,
not VPU throughput, dominates (CPU inference).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _phase_taps(factor: int):
    """Per-phase (source-row offset delta, hi-neighbor weight).

    For output position ``i*factor + p`` the source coordinate is
    ``i + a_p`` with ``a_p = (p + 0.5)/factor - 0.5``; the two taps sit at
    ``i + delta - 1`` and ``i + delta`` in *edge-padded* coordinates, where
    ``delta = floor(a_p) + 1`` is 0 for the first half of the phases and 1
    for the second.
    """
    a = (np.arange(factor) + 0.5) / factor - 0.5
    lo = np.floor(a)
    delta = (lo + 1).astype(int)  # 0 or 1 (padded-coordinate lo index)
    w_hi = (a - lo).astype(np.float32)
    return delta, w_hi


def _interp_axis(x: jnp.ndarray, axis: int, factor: int) -> jnp.ndarray:
    """Upsample one spatial axis by ``factor``: (.., n, ..) -> (.., n, f, ..)
    with the phase axis inserted AFTER ``axis`` (caller reshapes/merges).

    Built from shifted slices of the edge-padded input — each phase is
    ``(1 - w) * x[lo] + w * x[lo + 1]`` with phase-constant scalars, which
    XLA treats as elementwise work on two broadcast views.
    """
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, mode="edge")
    delta, w_hi = _phase_taps(factor)

    def view(start):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + n)
        return xp[tuple(idx)]

    views = {d: view(d) for d in (0, 1, 2)}
    phases = [
        (1.0 - float(w)) * views[int(d)] + float(w) * views[int(d) + 1]
        for d, w in zip(delta, w_hi)
    ]
    return jnp.stack(phases, axis=axis + 1)


def upsample_bilinear_argmax(
    logits: jnp.ndarray, out_hw: tuple[int, int]
) -> jnp.ndarray:
    """``argmax(resize_bilinear(logits, out_hw), -1)`` without materializing
    the full-resolution logits.

    Args:
      logits: (B, h, w, C) channel-last scores (any float dtype; interpolated
        in f32).
      out_hw: (H, W) with H % h == 0 and W % w == 0 (integer factors; the
        BiSeNet head is exactly x8, DeepLabV2 x8 at output-stride 8).

    Returns:
      (B, H, W) int32 predictions.
    """
    b, h, w, c = logits.shape
    H, W = out_hw
    if H % h or W % w:
        raise ValueError(
            f"fused upsample-argmax needs integer factors: {(h, w)} -> {(H, W)}"
        )
    fh, fw = H // h, W // w
    x = logits.astype(jnp.float32)
    if fh == 1 and fw == 1:
        return jnp.argmax(x, axis=-1).astype(jnp.int32)
    # H first: (B, h, fh, w, C) — materializes fh x the low-res field (a few
    # MB); the W stage + argmax fuse, so the (B, H, W, C) field never exists.
    if fh > 1:
        x = _interp_axis(x, 1, fh)  # (B, h, fh, w, C)
    else:
        x = x[:, :, None]
    if fw > 1:
        x = _interp_axis(x, 3, fw)  # (B, h, fh, w, fw, C)
    else:
        x = x[:, :, :, :, None]
    preds = jnp.argmax(x, axis=-1).astype(jnp.int32)  # (B, h, fh, w, fw)
    return preds.reshape(b, H, W)
