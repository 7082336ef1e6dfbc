"""Stem formulations A/B on TPU: which beats the native 7x7/2 conv?

Candidates for conv(x_rgb, 7x7, s2, p3 -> 64) at (4,512,1024,3):
  a) native            — lax.conv as-is (~1.0 ms measured)
  b) phase-conv        — ONE stride-4 conv with a zero-scattered 12x12
                         kernel producing 4 output phases (256 ch), then
                         depth-to-space 2x2. No input repacking at all; the
                         only relayout is the d2s on 256-channel data.
  c) d2s alone         — cost of the depth-to-space epilogue, isolated.
  d) maxpool — raw reduce_window vs the production max_pool_torch path
     (the pair-packed variant was rejected and removed; see layers.py NOTE).

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stem_phase_conv.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 100
RING = 2
B, H, W = 4, 512, 1024


def timeit(fn, ring):
    @jax.jit
    def loop(ring, n):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(ring, i % RING, keepdims=False)
            return acc + jnp.sum(fn(x).astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(ring, 5))
    t0 = time.perf_counter()
    float(loop(ring, ITERS))
    return (time.perf_counter() - t0) / ITERS


def build_phase_kernel(w, stride, pad, phase):
    """(kh,kw,ci,co) stride-s kernel -> (kp,kp,ci,phase^2*co) stride-(s*phase)
    kernel computing `phase` output phases per axis; output needs d2s(phase).

    Output row (phase*i + a) of the original conv reads input rows
    (phase*i + a)*s - p + ty = (s*phase)*i + a*s - p + ty; relative to the
    big conv's window start (s*phase)*i - p, the tap offset is a*s + ty,
    so kp = (phase-1)*s + kh.
    """
    kh, kw, ci, co = w.shape
    kp = (phase - 1) * stride + kh
    wp = np.zeros((kp, kp, ci, phase * phase * co), np.float32)
    for a in range(phase):
        for b in range(phase):
            wp[
                a * stride : a * stride + kh,
                b * stride : b * stride + kw,
                :,
                (a * phase + b) * co : (a * phase + b) * co + co,
            ] = np.asarray(w)
    return jnp.asarray(wp)


def depth_to_space(y, g, co):
    b_, h, w_, _ = y.shape
    return (
        y.reshape(b_, h, w_, g, g, co)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b_, h * g, w_ * g, co)
    )


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.RandomState(0)
    x_ring = jnp.asarray(rng.randn(RING, B, H, W, 3), jnp.bfloat16)
    w7 = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.float32)

    def native(x):
        return jax.lax.conv_general_dilated(
            x, w7.astype(jnp.bfloat16), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    t = timeit(native, x_ring)
    print(f"stem native 7x7/2      : {t*1e3:7.3f} ms", file=sys.stderr)

    wp = build_phase_kernel(w7, 2, 3, 2).astype(jnp.bfloat16)

    def phase_conv(x):
        y = jax.lax.conv_general_dilated(
            x, wp, (4, 4), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return depth_to_space(y, 2, 64)

    # shape check vs native once
    a = np.asarray(native(x_ring[0]).astype(jnp.float32))
    b = np.asarray(phase_conv(x_ring[0]).astype(jnp.float32))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
    print(f"phase-conv rel err: {err:.2e} shapes {a.shape}=={b.shape}", file=sys.stderr)
    t = timeit(phase_conv, x_ring)
    print(f"stem phase-conv 12x12/4: {t*1e3:7.3f} ms", file=sys.stderr)

    def phase_conv_only(x):
        return jax.lax.conv_general_dilated(
            x, wp, (4, 4), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    t = timeit(phase_conv_only, x_ring)
    print(f"  conv part only       : {t*1e3:7.3f} ms", file=sys.stderr)

    y_ring = jnp.asarray(
        rng.randn(RING, B, H // 4, W // 4, 256), jnp.bfloat16
    )
    t = timeit(lambda y: depth_to_space(y, 2, 64), y_ring)
    print(f"  d2s epilogue alone   : {t*1e3:7.3f} ms", file=sys.stderr)

    # spatial conv1 3x3/2: phase form = 6x6 stride 4 (pad 1)
    w3 = jnp.asarray(rng.randn(3, 3, 3, 64) * 0.1, jnp.float32)
    wp3 = build_phase_kernel(w3, 2, 1, 2).astype(jnp.bfloat16)

    def sp1_native(x):
        return jax.lax.conv_general_dilated(
            x, w3.astype(jnp.bfloat16), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def sp1_phase(x):
        y = jax.lax.conv_general_dilated(
            x, wp3, (4, 4), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return depth_to_space(y, 2, 64)

    a = np.asarray(sp1_native(x_ring[0]).astype(jnp.float32))
    b = np.asarray(sp1_phase(x_ring[0]).astype(jnp.float32))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
    print(f"sp1 phase rel err: {err:.2e}", file=sys.stderr)
    print(f"sp1 native 3x3/2       : {timeit(sp1_native, x_ring)*1e3:7.3f} ms", file=sys.stderr)
    print(f"sp1 phase-conv 6x6/4   : {timeit(sp1_phase, x_ring)*1e3:7.3f} ms", file=sys.stderr)

    # maxpool A/B at the stem output shape
    p_ring = jnp.asarray(rng.randn(RING, B, H // 2, W // 2, 64), jnp.bfloat16)

    def pool_old(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    from rtda_semanticsegmentation_tpu.models.layers import max_pool_torch

    print(f"maxpool reduce_window  : {timeit(pool_old, p_ring)*1e3:7.3f} ms", file=sys.stderr)
    # NOTE: the pair-packed pool variant was rejected and removed from
    # layers.py (reduce_window won, 0.77 vs 0.98 ms); max_pool_torch at
    # HEAD is the reduce_window path, so there is nothing left to A/B —
    # this row is retained as the production-path timing only.
    print(f"maxpool production path: {timeit(lambda x: max_pool_torch(x, 3, 2, 1), p_ring)*1e3:7.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
