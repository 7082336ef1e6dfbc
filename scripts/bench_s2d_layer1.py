"""Marginal cost of s2d-packed (f=2) stride-1 3x3 convs at 64 channels.

layer1 of ResNet-18 (4 convs at (4,128,256,64)) measures ~331 us/conv at 29
TFLOP/s natively (bench_conv_marginal.py) — output channels fill half the
MXU's 128 lanes. Packing 2x2 quadruples channels (256) at 1/4 the spatial
size; the packed kernel is 3x3 (taps span 4 original rows), so the packed
GEMM does 4x the MACs of the original at ~4x the utilization. This measures
whether the net is a win, chained K-deep to amortize the transport RTT.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_s2d_layer1.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtda_semanticsegmentation_tpu.models.layers import conv_s2d

ITERS = 100
RING = 2


def time_chain(conv_fn, n, h, w, c, k_convs):
    rng = np.random.RandomState(0)
    x_ring = jnp.asarray(rng.randn(RING, n, h, w, c), jnp.bfloat16)
    ws = jnp.asarray(rng.randn(k_convs, 3, 3, c, c) * 0.02, jnp.float32)

    @jax.jit
    def loop(x_ring, ws, iters):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(x_ring, i % RING, keepdims=False)

            def chain(j, x):
                wt = jax.lax.dynamic_index_in_dim(ws, j, keepdims=False)
                y = conv_fn(x, wt)
                return jnp.maximum(y, 0).astype(jnp.bfloat16)

            x = jax.lax.fori_loop(0, k_convs, chain, x)
            return acc + jnp.sum(x.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(loop(x_ring, ws, 5))
    t0 = time.perf_counter()
    float(loop(x_ring, ws, ITERS))
    return (time.perf_counter() - t0) / ITERS


def native(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def s2d2(x, w):
    return conv_s2d(x, w, 1, 1, 2, compute_dtype=jnp.bfloat16)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    for n, h, w, c in [(4, 128, 256, 64), (8, 128, 256, 64)]:
        flops = 2 * n * h * w * c * c * 9
        for name, fn in [("native", native), ("s2d f=2", s2d2)]:
            t1 = time_chain(fn, n, h, w, c, 1)
            t8 = time_chain(fn, n, h, w, c, 8)
            marg = (t8 - t1) / 7
            print(
                f"({n},{h},{w},{c}) {name:8s}: marginal {marg*1e6:7.1f} us/conv"
                f" ({flops/marg/1e12:5.1f} eff TFLOP/s)",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
