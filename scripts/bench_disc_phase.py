"""FC-Discriminator conv1 (19->64, 4x4/s2 @ 512x1024) phase-conv A/B on TPU.

The adversarial step evaluates D three times forward (+2 backwards); its
input is the 19-channel softmax map — another few-channel MXU-starved conv.
Also times the FULL discriminator forward and its input-gradient both ways.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_disc_phase.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtda_semanticsegmentation_tpu.models.layers import conv_phase

ITERS = 100
RING = 2
B, H, W, C = 8, 512, 1024, 19


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
    w1 = jnp.asarray(rng.randn(4, 4, C, 64) * 0.02, jnp.bfloat16)

    def native(x):
        return jax.lax.conv_general_dilated(
            x, w1, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def phased(x):
        return conv_phase(x, w1, 2, 1, 4)

    # correctness (bf16 operands; compare loosely)
    x0 = ring[0]
    np.testing.assert_allclose(
        np.asarray(phased(x0), np.float32),
        np.asarray(native(x0), np.float32),
        rtol=5e-2, atol=5e-2,
    )

    t_native = timeit(native, ring)
    t_phase = timeit(phased, ring)
    print(f"conv1 native : {t_native * 1e3:7.3f} ms")
    print(f"conv1 phase=4: {t_phase * 1e3:7.3f} ms")

    # Full D forward + input grad, both paths.
    from rtda_semanticsegmentation_tpu.models.discriminator import FCDiscriminator

    for fast in (False, True):
        try:
            disc = FCDiscriminator(num_classes=C, fast_input=fast)
        except TypeError:
            if fast:
                print("FCDiscriminator has no fast_input yet; skipping")
                break
            disc = FCDiscriminator(num_classes=C)
        v = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C), jnp.bfloat16))
        fwd = lambda x: disc.apply(v, x)
        t_f = timeit(fwd, ring)

        def fwd_bwd(x):
            def loss(x):
                return jnp.sum(disc.apply(v, x).astype(jnp.float32) ** 2)

            return jax.grad(loss)(x)

        t_fb = timeit(fwd_bwd, ring)
        print(
            f"D full fast_input={fast}: fwd {t_f * 1e3:7.3f} ms, "
            f"fwd+input-grad {t_fb * 1e3:7.3f} ms"
        )


if __name__ == "__main__":
    main()
