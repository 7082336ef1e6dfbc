"""Pallas tap-GEMM 3x3 conv vs native XLA at BiSeNet's hot shapes.

PERFORMANCE.md item 9: the v5e conv emitter runs 3x3 convs at small
spatial sizes (<=64x128) at 15-26 TFLOP/s with a ~0.7-1 ms floor. These
layers have C >= 64 (lane-friendly), so the 9-tap-GEMM Pallas kernel has
no sub-128-lane operand problem. Also times the fused scale/shift/ReLU
epilogue vs the native conv + elementwise chain.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_pallas_conv3.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtda_semanticsegmentation_tpu.ops.pallas_conv3 import conv3x3s1p1

ITERS, RING = 50, 2
# (B, H, W, C, CO): BiSeNet-r18 context path @ 512x1024 input, batch 8,
# plus a batch-32 inference shape and layer1 at 1/4 res.
SHAPES = [
    (8, 128, 256, 64, 64),
    (8, 64, 128, 128, 128),
    (8, 32, 64, 256, 256),
    (8, 16, 32, 512, 512),
    (32, 32, 64, 256, 256),
]


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
    print(f"device: {dev.device_kind}", file=sys.stderr)
    rng = np.random.RandomState(0)
    for b, h, wd, c, co in SHAPES:
        x_ring = jnp.asarray(rng.rand(RING, b, h, wd, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, c, co) * 0.05, jnp.bfloat16)
        s = jnp.asarray(rng.rand(co) + 0.5, jnp.float32)
        sh = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
        gflop = 2 * b * h * wd * 9 * c * co / 1e9

        def native(x):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def native_epi(x):
            y = native(x).astype(jnp.float32)
            return jnp.maximum(y * s + sh, 0.0).astype(jnp.bfloat16)

        ref = np.asarray(native(x_ring[0]), np.float32)
        ref_epi = np.asarray(native_epi(x_ring[0]), np.float32)
        t_n = timeit(native, x_ring)
        t_ne = timeit(native_epi, x_ring)
        line = (
            f"({b:2d},{h:3d},{wd:3d},{c:3d}->{co:3d}) "
            f"native {t_n * 1e3:6.3f} ms ({gflop / t_n / 1e3:5.1f} TF/s), "
            f"+epi {t_ne * 1e3:6.3f}"
        )
        for br in (8, 16, 32):

            def pallas(x, br=br):
                return conv3x3s1p1(x, w, block_rows=br)

            def pallas_epi(x, br=br):
                return conv3x3s1p1(x, w, s, sh, block_rows=br, relu=True)

            try:
                got = np.asarray(pallas(x_ring[0]), np.float32)
                ok = (
                    "ok"
                    if np.allclose(got, ref, atol=0.35, rtol=0.05)
                    else "MISMATCH"
                )
                got2 = np.asarray(pallas_epi(x_ring[0]), np.float32)
                ok2 = (
                    "ok"
                    if np.allclose(got2, ref_epi, atol=0.35, rtol=0.05)
                    else "MISMATCH"
                )
                t_p = timeit(pallas, x_ring)
                t_pe = timeit(pallas_epi, x_ring)
                line += (
                    f" | R{br}: {t_p * 1e3:6.3f} "
                    f"({gflop / t_p / 1e3:5.1f} TF/s)[{ok}] "
                    f"+epi {t_pe * 1e3:6.3f}[{ok2}]"
                )
            except Exception as e:
                line += f" | R{br}: FAIL {type(e).__name__} {str(e)[:60]}"
        print(line)


if __name__ == "__main__":
    main()
