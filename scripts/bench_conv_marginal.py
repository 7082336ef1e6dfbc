"""Marginal per-conv cost: chain K convs in one loop body, vary K.

The strategy microbenchmark (bench_conv_strategies.py) showed a ~700us floor
per measured fori_loop iteration regardless of conv FLOPs or formulation —
so per-iteration overhead, not conv codegen, dominated it. This script
separates the two: time(K convs chained) vs K gives the true marginal cost
of one conv at each shape (slope), and the loop/transport overhead
(intercept).

Run on TPU:  python scripts/bench_conv_marginal.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50
RING = 2


def time_chain(n, h, w, c, k_convs):
    rng = np.random.RandomState(0)
    x_ring = jnp.asarray(rng.randn(RING, n, h, w, c), jnp.bfloat16)
    ws = jnp.asarray(rng.randn(k_convs, 3, 3, c, c) * 0.02, jnp.bfloat16)

    @jax.jit
    def loop(x_ring, ws, iters):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(x_ring, i % RING, keepdims=False)

            def chain(j, x):
                w = jax.lax.dynamic_index_in_dim(ws, j, keepdims=False)
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )
                # relu + cast prevents XLA from folding consecutive convs
                return jnp.maximum(y, 0).astype(jnp.bfloat16)

            x = jax.lax.fori_loop(0, k_convs, chain, x)
            return acc + jnp.sum(x.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(loop(x_ring, ws, 5))
    t0 = time.perf_counter()
    float(loop(x_ring, ws, ITERS))
    return (time.perf_counter() - t0) / ITERS


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    shapes = [
        (4, 16, 32, 512),   # bisenet layer4
        (4, 32, 64, 256),   # layer3
        (4, 64, 128, 128),  # layer2
        (4, 128, 256, 64),  # layer1
        (4, 256, 512, 64),  # stem-out scale (control)
    ]
    for n, h, w, c in shapes:
        flops = 2 * n * h * w * c * c * 9
        t1 = time_chain(n, h, w, c, 1)
        t4 = time_chain(n, h, w, c, 4)
        t8 = time_chain(n, h, w, c, 8)
        marg = (t8 - t1) / 7
        print(
            f"({n},{h},{w},{c}) K=1 {t1*1e6:7.1f}us K=4 {t4*1e6:7.1f}us "
            f"K=8 {t8*1e6:7.1f}us -> marginal {marg*1e6:7.1f}us/conv "
            f"({flops/marg/1e12:5.1f} TFLOP/s), overhead {(t1-marg)*1e6:6.1f}us",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
