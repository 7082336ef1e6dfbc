"""Pallas fused-im2col D-conv1 vs native XLA conv on TPU.

Forward + backward A/B of ops/pallas_conv.py at the adversarial-step shape
(8, 512, 1024, 19) -> (8, 256, 512, 64), with a block-size sweep.

NOTE: the timed fns take every big array via the ring args — closing over a
concrete 160 MB array bakes it into the program as a constant and blows the
remote-compile request limit (HTTP 413, observed).

Run on TPU:  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_pallas_conv.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtda_semanticsegmentation_tpu.ops.pallas_conv import (
    conv4x4s2p1,
    conv4x4s2p1_dw,
    conv4x4s2p1_dx,
)

ITERS = 50
RING = 2
B, H, W, C, CO = 8, 512, 1024, 19, 64


def timeit(fn, *rings):
    @jax.jit
    def loop(n, *rings):
        def body(i, acc):
            args = [
                jax.lax.dynamic_index_in_dim(r, i % RING, keepdims=False)
                for r in rings
            ]
            return acc + jnp.sum(fn(*args).astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(5, *rings))
    t0 = time.perf_counter()
    float(loop(ITERS, *rings))
    return (time.perf_counter() - t0) / ITERS


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.RandomState(0)
    x_ring = jnp.asarray(rng.rand(RING, B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(4, 4, C, CO) * 0.02, jnp.bfloat16)
    dy_ring = jnp.asarray(
        rng.randn(RING, B, H // 2, W // 2, CO), jnp.bfloat16
    )
    gflop = 2 * B * (H // 2) * (W // 2) * 16 * C * CO / 1e9

    def conv_f(x, wk):
        return jax.lax.conv_general_dilated(
            x, wk, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    ref = np.asarray(conv_f(x_ring[0], w), np.float32)
    t = timeit(lambda x: conv_f(x, w), x_ring)
    print(f"native fwd      : {t * 1e3:7.3f} ms ({gflop / t / 1e3:5.1f} TFLOP/s)")

    for br, ck in ((8, 4), (8, 8), (16, 8), (32, 8)):
        def pallas(x, br=br, ck=ck):
            return conv4x4s2p1(x, w, block_rows=br, chunk=ck)

        try:
            got = np.asarray(pallas(x_ring[0]), np.float32)
            ok = "ok" if np.allclose(got, ref, atol=0.1, rtol=0.05) else "MISMATCH"
            t = timeit(pallas, x_ring)
            print(
                f"pallas fwd R={br:3d} c={ck:2d}: {t * 1e3:7.3f} ms "
                f"({gflop / t / 1e3:5.1f} TFLOP/s) [{ok}]"
            )
        except Exception as e:
            print(f"pallas fwd R={br:3d} c={ck:2d}: FAILED {type(e).__name__}: {str(e)[:160]}")

    # ---- backward ----
    _, vjp = jax.vjp(conv_f, x_ring[0], w)
    dx_ref, dw_ref = vjp(dy_ring[0])
    dx_ref = np.asarray(dx_ref, np.float32)
    dw_ref = np.asarray(dw_ref, np.float32)

    def native_dw(x, dy):
        _, vjp = jax.vjp(lambda wk: conv_f(x, wk), w)
        return vjp(dy)[0]

    t = timeit(native_dw, x_ring, dy_ring)
    print(f"native dW       : {t * 1e3:7.3f} ms")
    for br in (8, 16, 32):
        def p_dw(x, dy, br=br):
            return conv4x4s2p1_dw(x, dy, block_rows=br)

        try:
            got = np.asarray(p_dw(x_ring[0], dy_ring[0]), np.float32)
            rel = np.abs(got - dw_ref).max() / (np.abs(dw_ref).max() + 1e-9)
            t = timeit(p_dw, x_ring, dy_ring)
            print(f"pallas dW R={br:3d}  : {t * 1e3:7.3f} ms [rel {rel:.2e}]")
        except Exception as e:
            print(f"pallas dW R={br:3d}  : FAILED {type(e).__name__}: {str(e)[:160]}")

    def native_dx(x, dy):
        _, vjp = jax.vjp(lambda xx: conv_f(xx, w), x)
        return vjp(dy)[0]

    t = timeit(native_dx, x_ring, dy_ring)
    print(f"native dx       : {t * 1e3:7.3f} ms")
    for br in (8, 16, 32):
        def p_dx(dy, br=br):
            return conv4x4s2p1_dx(dy, w, block_rows=br)

        try:
            got = np.asarray(p_dx(dy_ring[0]), np.float32)
            rel = np.abs(got - dx_ref).max() / (np.abs(dx_ref).max() + 1e-9)
            t = timeit(p_dx, dy_ring)
            print(f"pallas dx R={br:3d}  : {t * 1e3:7.3f} ms [rel {rel:.2e}]")
        except Exception as e:
            print(f"pallas dx R={br:3d}  : FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
