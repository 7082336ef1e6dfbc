"""Follow-ups: (1) BiSeNet eval throughput at batch 64; (2) D conv1
(19->64, 4x4/s2 @ 512x1024) as 16 shifted strided-slice GEMMs vs native.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_misc_followups.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50
RING = 2


def timeit(fn, ring, iters=ITERS):
    @jax.jit
    def loop(ring, n):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(ring, i % RING, keepdims=False)
            return acc + jnp.sum(fn(x).astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(ring, 5))
    t0 = time.perf_counter()
    float(loop(ring, iters))
    return (time.perf_counter() - t0) / iters


def bisenet_b64():
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model

    cfg = ExperimentConfig()
    model = build_model(cfg.model)
    h, w = 512, 1024
    variables = init_model(model, jax.random.PRNGKey(0), (1, h, w, 3), train=False)
    rng = np.random.RandomState(0)
    for b in (32, 64):
        ring = jnp.asarray(rng.rand(RING, b, h, w, 3), jnp.bfloat16)
        t = timeit(lambda x: model.apply(variables, x, False), ring, iters=30)
        print(f"bisenet eval b{b}: {t * 1e3:7.2f} ms ({b / t:6.1f} img/s)")


def d_conv1():
    rng = np.random.RandomState(0)
    B, H, W, C, CO = 8, 512, 1024, 19, 64
    ring = jnp.asarray(rng.rand(RING, B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(4, 4, C, CO) * 0.02, jnp.bfloat16)

    def native(x):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def gemm16(x):
        b, h, ww, ci = x.shape
        ho, wo = h // 2, ww // 2
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for ky in range(4):
            for kx in range(4):
                patch = jax.lax.slice(
                    xp, (0, ky, kx, 0),
                    (b, ky + 2 * (ho - 1) + 1, kx + 2 * (wo - 1) + 1, ci),
                    (1, 2, 2, 1),
                )
                term = jnp.einsum(
                    "bhwc,cd->bhwd", patch, w[ky, kx],
                    preferred_element_type=jnp.float32,
                )
                out = term if out is None else out + term
        return out.astype(x.dtype)

    x0 = ring[0]
    np.testing.assert_allclose(
        np.asarray(gemm16(x0), np.float32),
        np.asarray(native(x0), np.float32), rtol=5e-2, atol=5e-2,
    )
    print(f"D conv1 native : {timeit(native, ring) * 1e3:7.3f} ms")
    print(f"D conv1 16-GEMM: {timeit(gemm16, ring) * 1e3:7.3f} ms")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    d_conv1()
    bisenet_b64()


if __name__ == "__main__":
    main()
