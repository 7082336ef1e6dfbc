"""Feasibility probe: int8 conv throughput vs bf16 on TPU v5e.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS peak). If XLA
lowers ``lax.conv_general_dilated`` on s8 x s8 -> s32 to the int8 MXU path,
a post-training-quantized inference engine could lift the channel-rich
convs (the MXU-bound part of BiSeNet) up to 2x, and halve HBM bytes for the
bandwidth-bound few-channel ones.

Methodology: chained-conv marginal cost (see bench_conv_marginal.py) —
slope of time vs chain length isolates the per-conv cost from loop and
transport overhead, which dominates sub-ms one-shot timings on this runner.

Run on TPU:  python scripts/bench_int8_conv.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50
RING = 2


def time_chain(n, h, w, c, k_convs, dtype):
    rng = np.random.RandomState(0)
    if dtype == "int8":
        x_ring = jnp.asarray(
            rng.randint(-127, 128, (RING, n, h, w, c)), jnp.int8
        )
        ws = jnp.asarray(rng.randint(-127, 128, (k_convs, 3, 3, c, c)), jnp.int8)
        acc_t, out_t = jnp.int32, jnp.int8

        def post(y):
            # requantize stand-in: shift + clip + cast (per-tensor scale)
            return jnp.clip(y >> 7, -127, 127).astype(out_t)

    else:
        x_ring = jnp.asarray(rng.randn(RING, n, h, w, c), jnp.bfloat16)
        ws = jnp.asarray(rng.randn(k_convs, 3, 3, c, c) * 0.02, jnp.bfloat16)
        acc_t = jnp.float32

        def post(y):
            return jnp.maximum(y, 0).astype(jnp.bfloat16)

    @jax.jit
    def loop(x_ring, ws, iters):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(x_ring, i % RING, keepdims=False)

            def chain(j, x):
                w = jax.lax.dynamic_index_in_dim(ws, j, keepdims=False)
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc_t,
                )
                return post(y)

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
        (4, 128, 256, 64),  # layer1 (bandwidth/lane-bound in bf16)
    ]
    for n, h, w, c in shapes:
        flops = 2 * n * h * w * c * c * 9
        row = f"({n},{h},{w},{c})"
        for dtype in ("bf16", "int8"):
            try:
                t1 = time_chain(n, h, w, c, 1, dtype)
                t8 = time_chain(n, h, w, c, 8, dtype)
                marg = (t8 - t1) / 7
                row += (
                    f"  {dtype}: {marg * 1e6:7.1f}us/conv "
                    f"({flops / marg / 1e12:5.1f} T{'OP' if dtype == 'int8' else 'FLOP'}/s)"
                )
            except Exception as e:  # int8 conv may be unsupported
                row += f"  {dtype}: FAILED ({type(e).__name__}: {e})"
                break
        print(row, file=sys.stderr)


if __name__ == "__main__":
    main()
