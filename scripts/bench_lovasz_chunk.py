"""Chunk-size sweep for the Pallas Lovász histogram kernel on TPU.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_lovasz_chunk.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtda_semanticsegmentation_tpu.ops.pallas_lovasz import lovasz_radix_hist

B, H, W, C = 8, 512, 1024, 19
BINS = 1024
ITERS = 30
RING = 2


def timeit(fn, *rings):
    @jax.jit
    def loop(n, *rings):
        def body(i, acc):
            args = [
                jax.lax.dynamic_index_in_dim(r, i % RING, keepdims=False)
                for r in rings
            ]
            return acc + fn(*args)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(3, *rings))
    t0 = time.perf_counter()
    float(loop(ITERS, *rings))
    return (time.perf_counter() - t0) / ITERS


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.RandomState(0)
    p = B * H * W
    pt = jnp.asarray(rng.rand(RING, C, p), jnp.float32)
    lb = jnp.asarray(rng.randint(0, C, (RING, p)), jnp.int32)

    ref = None
    for chunk in (8192, 16384, 32768, 65536, 131072):
        def hist(ptc, lbc, chunk=chunk):
            return lovasz_radix_hist(ptc, lbc, BINS, 255, chunk).sum()

        out = float(jax.jit(lambda a, b: lovasz_radix_hist(a, b, BINS, 255, chunk).sum())(pt[0], lb[0]))
        if ref is None:
            ref = out
        t = timeit(hist, pt, lb)
        ok = "ok" if abs(out - ref) < 1e-3 * abs(ref) else f"MISMATCH {out} vs {ref}"
        print(f"chunk={chunk:6d}: {t * 1e3:7.2f} ms   [{ok}]")


if __name__ == "__main__":
    main()
