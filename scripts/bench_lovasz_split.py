"""Lovász-binned cost split on TPU: forward alone vs forward+backward.

Also times the two building blocks separately (Pallas histogram kernel,
XLA radix backward) to aim the next optimization.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_lovasz_split.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtda_semanticsegmentation_tpu.ops.losses import (
    _binned_lovasz_forward,
    lovasz_softmax_binned,
)

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
    logits = jnp.asarray(rng.randn(RING, B, H, W, C), jnp.float32)
    labels_np = rng.randint(0, C, (RING, B, H, W)).astype(np.int32)
    labels_np[:, :, 0, :] = 255
    labels = jnp.asarray(labels_np)

    def fwd(lg, lb):
        p = jax.nn.softmax(lg, axis=-1)
        return lovasz_softmax_binned(p, lb, 255, "present", BINS)

    def fwd_bwd(lg, lb):
        return jax.grad(lambda l: fwd(l, lb))(lg).sum()

    t_f = timeit(fwd, logits, labels)
    t_fb = timeit(fwd_bwd, logits, labels)
    print(f"loss fwd      : {t_f * 1e3:7.2f} ms")
    print(f"loss fwd+bwd  : {t_fb * 1e3:7.2f} ms  (bwd ~ {(t_fb - t_f) * 1e3:.2f})")

    # Histogram kernel alone (the Pallas producer).
    from rtda_semanticsegmentation_tpu.ops.pallas_lovasz import lovasz_radix_hist

    def hist_only(lg, lb):
        p = jax.nn.softmax(lg, axis=-1)
        pt = p.reshape(-1, C).T.astype(jnp.float32)
        return lovasz_radix_hist(pt, lb.reshape(-1), BINS, 255).sum()

    t_h = timeit(hist_only, logits, labels)
    print(f"softmax+hist  : {t_h * 1e3:7.2f} ms")

    def transpose_only(lg):
        p = jax.nn.softmax(lg, axis=-1)
        return p.reshape(-1, C).T.astype(jnp.float32).sum()

    t_t = timeit(transpose_only, logits)
    print(f"softmax+transp: {t_t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
