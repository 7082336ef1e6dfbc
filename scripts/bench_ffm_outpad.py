"""FFM conv (3x3, 1024 -> 19 @ 64x128) — does output-channel padding help?

Few-OUTPUT-channel convs may underuse the MXU's 128 output lanes. Tries
co = 19 native vs kernel zero-padded to 32/64/128 then sliced back.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ffm_outpad.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 100
RING = 2
B, H, W, CI, CO = 8, 64, 128, 1024, 19


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
    ring = jnp.asarray(rng.rand(RING, B, H, W, CI), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, CI, CO) * 0.02, jnp.bfloat16)

    def conv(x, wk):
        return jax.lax.conv_general_dilated(
            x, wk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    ref = conv(ring[0], w)
    t = timeit(lambda x: conv(x, w), ring)
    gflop = 2 * B * H * W * 9 * CI * CO / 1e9
    print(f"native co=19 : {t * 1e3:7.3f} ms ({gflop / t / 1e3:5.1f} TFLOP/s)")
    for cp in (32, 64, 128):
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cp - CO)))

        def padded(x, wp=wp):
            return conv(x, wp)[..., :CO]

        got = padded(ring[0])
        ok = "ok" if np.allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=1e-2, rtol=1e-2,
        ) else "MISMATCH"
        print(f"padded co={cp:3d}: {timeit(padded, ring) * 1e3:7.3f} ms  [{ok}]")


if __name__ == "__main__":
    main()
