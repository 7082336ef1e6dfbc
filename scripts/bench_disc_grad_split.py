"""Split FC-Discriminator conv1 cost into fwd / dW / dx on TPU.

The flagship adversarial step runs D-conv1 (19->64, 4x4/s2 @ 512x1024)
three times forward, twice in the D dW chain, once in the G dx chain
(train/steps.py). This times each piece natively, in isolation, by
timing only the `jax.vjp` backward fn with a precomputed cotangent, to
bound what a fused Pallas im2col conv could save.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_disc_grad_split.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtda_semanticsegmentation_tpu.models.discriminator import FCDiscriminator

ITERS = 50
RING = 2
B, H, W, C, CO = 8, 512, 1024, 19, 64


def timeit(fn, *rings):
    @jax.jit
    def loop(n, *rings):
        def body(i, acc):
            args = [jax.lax.dynamic_index_in_dim(r, i % RING, keepdims=False)
                    for r in rings]
            return acc + fn(*args)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(5, *rings))
    t0 = time.perf_counter()
    float(loop(ITERS, *rings))
    return (time.perf_counter() - t0) / ITERS


def fsum(t):
    leaves = jax.tree.leaves(t)
    out = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        out = out + jnp.sum(leaf.astype(jnp.float32))
    return out


def conv1(x, w):
    # pure bf16 like flax nn.Conv(dtype=bf16): keeps the vjp dtypes closed
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.RandomState(0)
    x_ring = jnp.asarray(rng.rand(RING, B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(4, 4, C, CO) * 0.02, jnp.bfloat16)
    dy_ring = jnp.asarray(rng.randn(RING, B, H // 2, W // 2, CO), jnp.bfloat16)

    gflop = 2 * B * (H // 2) * (W // 2) * 16 * C * CO / 1e9

    t = timeit(lambda x: fsum(conv1(x, w)), x_ring)
    print(f"conv1 fwd      : {t * 1e3:7.3f} ms ({gflop / t / 1e3:5.1f} TFLOP/s)")

    def dw_only(x, dy):
        _, vjp = jax.vjp(lambda w: conv1(x, w), w)
        return fsum(vjp(dy)[0])

    # NOTE: vjp runs the fwd too inside the timed fn; XLA prunes the primal
    # output (fsum only uses the grad) but keeps fwd work shared with bwd.
    t_dw = timeit(dw_only, x_ring, dy_ring)
    print(f"conv1 dW(+dead fwd): {t_dw * 1e3:7.3f} ms")

    def dx_only(x, dy):
        _, vjp = jax.vjp(lambda x: conv1(x, w), x)
        return fsum(vjp(dy)[0])

    t_dx = timeit(dx_only, x_ring, dy_ring)
    print(f"conv1 dx(+dead fwd): {t_dx * 1e3:7.3f} ms")

    # Full discriminator
    model = FCDiscriminator(num_classes=C)
    params = model.init(jax.random.PRNGKey(0), x_ring[0])["params"]

    def dfwd(x):
        return fsum(model.apply({"params": params}, x))

    t = timeit(dfwd, x_ring)
    print(f"full D fwd     : {t * 1e3:7.3f} ms")

    dyd_ring = jnp.asarray(
        rng.randn(RING, B, H // 32, W // 32, 1), jnp.bfloat16)

    def d_dparams(x, dyd):
        _, vjp = jax.vjp(
            lambda p: model.apply({"params": p}, x), params)
        return fsum(vjp(dyd)[0])

    t = timeit(d_dparams, x_ring, dyd_ring)
    print(f"full D fwd+dparams : {t * 1e3:7.3f} ms")

    def d_dx(x, dyd):
        _, vjp = jax.vjp(lambda x: model.apply({"params": params}, x), x)
        return fsum(vjp(dyd)[0])

    t = timeit(d_dx, x_ring, dyd_ring)
    print(f"full D fwd+dx  : {t * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
