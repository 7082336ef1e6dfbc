"""Does zero-padding D conv1's 19 input channels speed up the conv emitter?

Native ci=19 vs input zero-padded to 32/64/128 with a zero-padded kernel
(exact same math — extra channels multiply zeros). Also the pad op cost.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_disc_chanpad.py
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


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.RandomState(0)
    ring = jnp.asarray(rng.rand(RING, B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(4, 4, C, CO) * 0.02, jnp.bfloat16)

    def conv(x, wk):
        return jax.lax.conv_general_dilated(
            x, wk, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    ref = conv(ring[0], w)
    print(f"native ci=19 : {timeit(lambda x: conv(x, w), ring) * 1e3:7.3f} ms")
    for cpad in (32, 64, 128):
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - C), (0, 0)))

        def padded(x, wp=wp, cpad=cpad):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad - C)))
            return conv(xp, wp)

        got = padded(ring[0])
        ok = "ok" if np.allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=1e-2, rtol=1e-2,
        ) else "MISMATCH"
        print(f"padded ci={cpad:3d}: {timeit(padded, ring) * 1e3:7.3f} ms  [{ok}]")

    def pad_only(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - C)))

    print(f"pad->128 only: {timeit(pad_only, ring) * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
