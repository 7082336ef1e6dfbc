"""Are DeepLabV2's dilated 3x3 convs the 5x-off-SoL culprit on v5e?

Times, at the os8 working resolution (b2, 64x128 spatial):
  a) 3x3 conv, 256ch, dilation 1
  b) 3x3 conv, 256ch, dilation 2   (layer3 shape)
  c) 3x3 conv, 512ch, dilation 4   (layer4 shape)
  d) (b) expressed as 9 shifted 1x1 GEMMs summed — dense MXU contractions,
     channel-wide slices (NOT the few-channel relayout trap)
  e) full bottleneck block (1x1 -> 3x3 dil2 -> 1x1) for context

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_dilated_conv.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 100
RING = 2
B, H, W = 2, 64, 128


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


def conv(x, w, dil):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((dil, dil), (dil, dil)),
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_as_9_gemms(x, w, dil):
    """3x3 rhs-dilated conv as 9 shifted 1x1 contractions, summed."""
    b, h, ww, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (dil, dil), (dil, dil), (0, 0)))
    out = None
    for ky in range(3):
        for kx in range(3):
            patch = jax.lax.dynamic_slice(
                xp, (0, ky * dil, kx * dil, 0), (b, h, ww, ci)
            )
            term = jnp.einsum(
                "bhwc,cd->bhwd", patch, w[ky, kx],
                preferred_element_type=jnp.float32,
            )
            out = term if out is None else out + term
    return out.astype(x.dtype)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.RandomState(0)

    for ch, dil, tag in ((256, 1, "256ch dil1"), (256, 2, "256ch dil2"),
                         (512, 4, "512ch dil4")):
        ring = jnp.asarray(rng.randn(RING, B, H, W, ch), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, ch, ch) * 0.05, jnp.bfloat16)
        t = timeit(lambda x, w=w, d=dil: conv(x, w, d), ring)
        gflop = 2 * B * H * W * 9 * ch * ch / 1e9
        print(f"conv {tag:10s}: {t * 1e3:7.3f} ms  ({gflop / t / 1e3:6.1f} TFLOP/s)")
        t9 = timeit(lambda x, w=w, d=dil: conv_as_9_gemms(x, w, d), ring)
        print(f"9-GEMM {tag:8s}: {t9 * 1e3:7.3f} ms  ({gflop / t9 / 1e3:6.1f} TFLOP/s)")

    # context: the exact bottleneck middle at layer3 (1x1 1024->256,
    # 3x3 dil2 256, 1x1 256->1024)
    ring = jnp.asarray(rng.randn(RING, B, H, W, 1024), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(1, 1, 1024, 256) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, 256, 256) * 0.05, jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(1, 1, 256, 1024) * 0.05, jnp.bfloat16)

    def block(x):
        y = conv(x, w1, 1)
        y = conv(y, w2, 2)
        return conv(y, w3, 1)

    t = timeit(block, ring)
    gflop = 2 * B * H * W * (1024 * 256 + 9 * 256 * 256 + 256 * 1024) / 1e9
    print(f"bottleneck(1024/256,dil2): {t * 1e3:7.3f} ms  ({gflop / t / 1e3:6.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
