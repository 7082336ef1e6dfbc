"""Microbenchmark: XLA native conv vs conv-as-GEMM at BiSeNet's hot shapes.

PERFORMANCE.md finding #9: on v5e, 3x3 convs at spatial sizes <= 64x128 run
at 15-26 TFLOP/s with a ~0.7-1 ms fixed cost each, vs ~97 TFLOP/s at large
spatial sizes. BiSeNet-R18's context-path layers 3/4 (10 convs at 32x64 and
16x32) therefore dominate its forward. This script measures, per shape:

  a) lax.conv_general_dilated (what flax nn.Conv emits), NHWC bf16
  b) shift-accumulate: y = sum_{ky,kx} shift(x, ky, kx) @ W[ky, kx]
     (9 MXU GEMMs on (N*H*W, C) matrices; shifts are static slices)
  c) im2col: concat the 9 shifted views on the channel axis, one
     (N*H*W, 9C) @ (9C, F) GEMM

Timing: compiled-loop ring protocol (see PERFORMANCE.md) — N iters inside one
lax.fori_loop over a ring of inputs, one scalar fetch at the end.

Run on TPU:  python scripts/bench_conv_strategies.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50
RING = 4


def conv_native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _shift(x, dy, dx):
    """x padded by 1 then sliced: the (dy,dx) tap of a 3x3 same conv."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, w, c))


def conv_shift_acc(x, w):
    n, h, wd, c = x.shape
    f = w.shape[-1]
    acc = jnp.zeros((n * h * wd, f), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            xs = _shift(x, ky, kx).reshape(n * h * wd, c)
            acc += jnp.dot(xs, w[ky, kx], preferred_element_type=jnp.float32)
    return acc.reshape(n, h, wd, f).astype(x.dtype)


def conv_im2col(x, w):
    n, h, wd, c = x.shape
    f = w.shape[-1]
    cols = jnp.concatenate(
        [_shift(x, ky, kx) for ky in range(3) for kx in range(3)], axis=-1
    ).reshape(n * h * wd, 9 * c)
    y = jnp.dot(
        cols, w.reshape(9 * c, f), preferred_element_type=jnp.float32
    )
    return y.reshape(n, h, wd, f).astype(x.dtype)


def time_fn(fn, x_ring, w):
    @jax.jit
    def loop(x_ring, w, n):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(x_ring, i % RING, keepdims=False)
            return acc + jnp.sum(fn(x, w).astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(x_ring, w, 5))
    t0 = time.perf_counter()
    float(loop(x_ring, w, ITERS))
    return (time.perf_counter() - t0) / ITERS


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.RandomState(0)
    # (batch, H, W, C_in, C_out): BiSeNet-R18 @ 512x1024 hot shapes + one
    # large-shape control.
    shapes = [
        (4, 16, 32, 512, 512),   # layer4 3x3
        (4, 32, 64, 256, 256),   # layer3 3x3
        (4, 64, 128, 128, 128),  # layer2 3x3
        (4, 64, 128, 256, 256),  # spatial path tail
        (4, 128, 256, 64, 64),   # layer1 3x3 (control, larger spatial)
        (16, 16, 32, 512, 512),  # layer4 at batch 16
    ]
    for n, h, w_, ci, co in shapes:
        x = jnp.asarray(
            rng.randn(RING, n, h, w_, ci), jnp.bfloat16
        )
        wts = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, jnp.bfloat16)
        flops = 2 * n * h * w_ * ci * co * 9
        res = {}
        for name, fn in [
            ("native", conv_native),
            ("shift9", conv_shift_acc),
            ("im2col", conv_im2col),
        ]:
            t = time_fn(fn, x, wts)
            res[name] = t
            print(
                f"({n},{h},{w_},{ci}->{co}) {name:7s}: {t * 1e6:8.1f} us  "
                f"{flops / t / 1e12:6.1f} TFLOP/s",
                file=sys.stderr,
            )
        best = min(res, key=res.get)
        print(
            f"  -> best: {best} ({res['native'] / res[best]:.2f}x vs native)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
