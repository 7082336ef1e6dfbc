"""Does a (…, C) tensor with C < 128 cost like C=128 in HBM traffic?

Times a pure streaming op (x*2+1, summed) over (8, 512, 1024, C) for
C in {8, 16, 19, 32, 64, 128}, f32 and bf16, plus the channel-major
(C, P) alternative. If time is ~flat in C, the tiled layout pads the
minor dim to 128 lanes and every 19-channel full-res map is ~6.7x
inflated — a structural argument for keeping hot 19-channel data
channel-major.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_minor_dim_padding.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 8, 512, 1024
ITERS = 50
RING = 2


def timeit(fn, ring):
    @jax.jit
    def loop(ring, n):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(ring, i % RING, keepdims=False)
            return acc + fn(x)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(ring, 5))
    t0 = time.perf_counter()
    float(loop(ring, ITERS))
    return (time.perf_counter() - t0) / ITERS


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.RandomState(0)

    def stream(x):
        return jnp.sum((x * 2.0 + 1.0).astype(jnp.float32))

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for c in (8, 16, 19, 32, 64, 128):
            ring = jnp.asarray(rng.rand(RING, B, H, W, c), dtype)
            t = timeit(stream, ring)
            mb = B * H * W * c * np.dtype(np.float32 if dtype == jnp.float32 else np.float16).itemsize / 1e6
            print(f"{name} (B,H,W,{c:3d}): {t * 1e3:7.3f} ms  logical {mb:7.1f} MB  eff {mb/ (t*1e3) :6.1f} GB/s")
        # channel-major comparison at C=19
        ring = jnp.asarray(rng.rand(RING, 19, B * H * W), dtype)
        t = timeit(stream, ring)
        mb = 19 * B * H * W * (4 if dtype == jnp.float32 else 2) / 1e6
        print(f"{name} (19, P)     : {t * 1e3:7.3f} ms  logical {mb:7.1f} MB  eff {mb/(t*1e3):6.1f} GB/s")


if __name__ == "__main__":
    main()
