"""D conv1 as a flat sliding-window GEMM (window = 2 x stride trick).

conv(x(B,512,1024,19), w(4,4,19,64), s2, p1) has flat window 4*19 = 76
along the W*C axis with flat stride 2*19 = 38 — exactly 2x. So im2col is
TWO overlapping slices of the free reshape (W+2)*19 = 513*38: no gather,
no few-channel relayout. Rows are handled by 4 strided ky-strips.

Times native vs flat-GEMM, forward and forward+input-grad.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_disc_flatconv.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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


def flat_conv(x, w):
    """conv_general_dilated(x, w, (2,2), ((1,1),(1,1))) via flat GEMMs."""
    b, h, ww, c = x.shape
    kh, kw, ci, co = w.shape
    ho, wo = h // 2, ww // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (b, h+2, w+2, c)
    flat_cols = (ww + 2) * c  # 513 * 38 here: (w+2)*c = (wo+1) * (2*c)
    out = None
    for ky in range(kh):
        strip = xp[:, ky : ky + 2 * (ho - 1) + 1 : 2]  # (b, ho, w+2, c)
        a0 = strip.reshape(b, ho, (ww + 2) * c // (2 * c), 2 * c)  # (b,ho,513,38)
        al = a0[:, :, :-1, :]  # window first half
        ar = a0[:, :, 1:, :]  # window second half (shift by one stride)
        a = jnp.concatenate([al, ar], axis=-1)  # (b, ho, wo, 2*kw_half... 76)
        wk = w[ky].reshape(kw * ci, co)  # (76, 64)
        term = jnp.einsum(
            "bhwk,kd->bhwd", a, wk, preferred_element_type=jnp.float32
        )
        out = term if out is None else out + term
    return out.astype(x.dtype)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.RandomState(0)
    ring = jnp.asarray(rng.rand(RING, B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(4, 4, C, CO) * 0.02, jnp.bfloat16)

    def native(x):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    got = flat_conv(ring[0], w)
    ref = native(ring[0])
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    print("correctness ok")
    print(f"native fwd   : {timeit(native, ring) * 1e3:7.3f} ms")
    print(f"flatGEMM fwd : {timeit(lambda x: flat_conv(x, w), ring) * 1e3:7.3f} ms")

    def g_native(x):
        return jax.grad(lambda y: jnp.sum(native(y).astype(jnp.float32) ** 2))(x)

    def g_flat(x):
        return jax.grad(lambda y: jnp.sum(flat_conv(y, w).astype(jnp.float32) ** 2))(x)

    print(f"native fwd+dx: {timeit(g_native, ring) * 1e3:7.3f} ms")
    print(f"flat   fwd+dx: {timeit(g_flat, ring) * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
