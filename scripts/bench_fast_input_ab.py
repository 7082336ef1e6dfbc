"""Full-model A/B: BiSeNet-R18 eval forward, fast_input on/off, b=4/8/16.

Attribution check for the phase-conv stems + head reorder: stage-isolated
timings showed phase stems SLOWER at b4, yet the full model sped up — this
times the whole forward both ways at the bench batch sizes.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fast_input_ab.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtda_semanticsegmentation_tpu.models.bisenet import BiSeNet

H, W = 512, 1024
ITERS = 100
RING = 2


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
    models = {
        fast: BiSeNet(num_classes=19, dtype=jnp.bfloat16, fast_input=fast)
        for fast in (False, True)
    }
    variables = models[True].init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32), False
    )
    for b in (4, 8, 16):
        ring = jnp.asarray(rng.rand(RING, b, H, W, 3), jnp.bfloat16)
        row = []
        for fast in (False, True):
            m = models[fast]
            t = timeit(lambda x: m.apply(variables, x, False), ring)
            row.append(f"fast={fast}: {t * 1e3:7.3f} ms ({b / t:6.1f} img/s)")
        print(f"b={b:2d}  " + "   ".join(row))


if __name__ == "__main__":
    main()
