"""Pallas fused-im2col D-conv1 vs native XLA conv on TPU.

Forward A/B of ops/pallas_conv.py::conv4x4s2p1 at the adversarial-step
shape (8, 512, 1024, 19) -> (8, 256, 512, 64), plus block-size sweep.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pallas_conv.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtda_semanticsegmentation_tpu.ops.pallas_conv import conv4x4s2p1

ITERS = 50
RING = 2
B, H, W, C, CO = 8, 512, 1024, 19, 64


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


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.RandomState(0)
    ring = jnp.asarray(rng.rand(RING, B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(4, 4, C, CO) * 0.02, jnp.bfloat16)
    gflop = 2 * B * (H // 2) * (W // 2) * 16 * C * CO / 1e9

    def native(x):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    ref = np.asarray(native(ring[0]), np.float32)
    t = timeit(native, ring)
    print(f"native          : {t * 1e3:7.3f} ms ({gflop / t / 1e3:5.1f} TFLOP/s)")

    for br, ck in ((16, 8), (32, 8), (32, 16), (64, 8), (64, 16)):
        def pallas(x, br=br, ck=ck):
            return conv4x4s2p1(x, w, block_rows=br, chunk=ck)

        try:
            got = np.asarray(pallas(ring[0]), np.float32)
            ok = "ok" if np.allclose(got, ref, atol=0.1, rtol=0.05) else "MISMATCH"
            t = timeit(pallas, ring)
            print(
                f"pallas R={br:3d} c={ck:2d}: {t * 1e3:7.3f} ms "
                f"({gflop / t / 1e3:5.1f} TFLOP/s) [{ok}]"
            )
        except Exception as e:
            print(f"pallas R={br:3d} c={ck:2d}: FAILED {type(e).__name__}: {e}")

    # ---- backward kernels ----
    from rtda_semanticsegmentation_tpu.ops.pallas_conv import (
        conv4x4s2p1_dw,
        conv4x4s2p1_dx,
    )

    dy_ring = jnp.asarray(
        rng.randn(RING, B, H // 2, W // 2, CO), jnp.bfloat16)

    def conv_f(x, wk):
        return jax.lax.conv_general_dilated(
            x, wk, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, vjp = jax.vjp(lambda x, wk: conv_f(x, wk), ring[0], w)
    dx_ref, dw_ref = vjp(dy_ring[0])

    def native_dw(dy):
        _, vjp = jax.vjp(lambda wk: conv_f(ring[0], wk), w)
        return vjp(dy)[0]

    t = timeit(native_dw, dy_ring)
    print(f"native dW       : {t * 1e3:7.3f} ms")
    for br in (16, 32):
        def p_dw(dy, br=br):
            return conv4x4s2p1_dw(ring[0], dy, block_rows=br)

        got = np.asarray(p_dw(dy_ring[0]), np.float32)
        rel = np.abs(got - np.asarray(dw_ref, np.float32)).max() / (
            np.abs(np.asarray(dw_ref, np.float32)).max() + 1e-9)
        t = timeit(p_dw, dy_ring)
        print(f"pallas dW R={br:3d} : {t * 1e3:7.3f} ms [rel {rel:.2e}]")

    def native_dx(dy):
        _, vjp = jax.vjp(lambda x: conv_f(x, w), ring[0])
        return vjp(dy)[0]

    t = timeit(native_dx, dy_ring)
    print(f"native dx       : {t * 1e3:7.3f} ms")
    for br in (16, 32):
        def p_dx(dy, br=br):
            return conv4x4s2p1_dx(dy, w, block_rows=br)

        got = np.asarray(p_dx(dy_ring[0]), np.float32)
        rel = np.abs(got - np.asarray(dx_ref, np.float32)).max() / (
            np.abs(np.asarray(dx_ref, np.float32)).max() + 1e-9)
        t = timeit(p_dx, dy_ring)
        print(f"pallas dx R={br:3d} : {t * 1e3:7.3f} ms [rel {rel:.2e}]")


if __name__ == "__main__":
    main()
