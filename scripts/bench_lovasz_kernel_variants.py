"""A/B variants of the Pallas Lovász histogram kernel on TPU.

v0: current production kernel (fori_loop classes, (T,k2) oh2)
v1: unrolled class loop (lets Mosaic software-pipeline VPU construction
    of class c+1 against the MXU dot of class c)
v2: v1 + oh2 built as (k2,T) and contracted on dim 1 — never materializes
    the pathological (T,32) layout (32 < 128 lanes wastes 3/4 of each tile)

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_lovasz_kernel_variants.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtda_semanticsegmentation_tpu.ops.pallas_lovasz import lovasz_radix_hist

B, H, W, C = 8, 512, 1024, 19
BINS = 1024
K1 = K2 = 32
ITERS = 30
RING = 2
CHUNK = 8192  # unrolled variants keep 19 classes of intermediates live -> VMEM
IGNORE = 255


def _kernel_v(probas_ref, labels_ref, out_ref, *, unroll: bool, oh2_t: bool):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    labels = labels_ref[0, :]
    valid = labels != IGNORE
    t = labels.shape[0]
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (K1, t), 0)
    if oh2_t:
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (K2, t), 0)
    else:
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (t, K2), 1)

    def body(c):
        p_c = probas_ref[c, :]
        fg = (labels == c).astype(jnp.float32)
        e = jnp.abs(fg - p_c)
        b = jnp.clip((e * BINS).astype(jnp.int32), 0, BINS - 1)
        c1 = jnp.where(valid, b // K2, -1)
        c2 = b % K2
        oh1 = (c1[None, :] == rows1).astype(jnp.bfloat16)
        lhs = jnp.concatenate(
            [
                oh1,
                oh1 * fg[None, :].astype(jnp.bfloat16),
                oh1 * e[None, :].astype(jnp.bfloat16),
            ],
            axis=0,
        )
        if oh2_t:
            oh2 = (c2[None, :] == rows2).astype(jnp.bfloat16)  # (K2, T)
            part = jax.lax.dot_general(
                lhs, oh2,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            oh2 = (c2[:, None] == cols2).astype(jnp.bfloat16)  # (T, K2)
            part = jax.lax.dot_general(
                lhs, oh2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        row = c * (3 * K1)
        out_ref[pl.ds(row, 3 * K1), :] += part

    if unroll:
        for c in range(C):
            body(c)
    else:
        jax.lax.fori_loop(0, C, lambda c, _: (body(c), _)[1], None)


def make_variant(unroll, oh2_t):
    kernel = functools.partial(_kernel_v, unroll=unroll, oh2_t=oh2_t)

    @jax.jit
    def run(probas_t, labels):
        p = probas_t.shape[1]
        pad = (-p) % CHUNK
        if pad:
            probas_t = jnp.pad(probas_t, ((0, 0), (0, pad)))
            labels = jnp.pad(labels, (0, pad), constant_values=IGNORE)
        total = probas_t.shape[1]
        out = pl.pallas_call(
            kernel,
            grid=(total // CHUNK,),
            in_specs=[
                pl.BlockSpec((C, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (C * 3 * K1, K2), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((C * 3 * K1, K2), jnp.float32),
        )(probas_t.astype(jnp.float32), labels.reshape(1, -1).astype(jnp.int32))
        return out.reshape(C, 3, BINS)

    return run


def timeit(fn, *rings):
    @jax.jit
    def loop(n, *rings):
        def bd(i, acc):
            args = [
                jax.lax.dynamic_index_in_dim(r, i % RING, keepdims=False)
                for r in rings
            ]
            return acc + fn(*args).sum()

        return jax.lax.fori_loop(0, n, bd, jnp.zeros((), jnp.float32))

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
    lb_np = rng.randint(0, C, (RING, p)).astype(np.int32)
    lb_np[:, :1000] = IGNORE
    lb = jnp.asarray(lb_np)

    ref = np.asarray(jax.jit(lambda a, b: lovasz_radix_hist(a, b, BINS, IGNORE))(pt[0], lb[0]))
    t0 = timeit(lambda a, b: lovasz_radix_hist(a, b, BINS, IGNORE, CHUNK), pt, lb)
    print(f"v0 production          : {t0 * 1e3:7.2f} ms")
    for name, unroll, oh2_t in (
        ("v1 unrolled", True, False),
        ("v2 unrolled + oh2(k2,T)", True, True),
        ("v3 rolled   + oh2(k2,T)", False, True),
    ):
        run = make_variant(unroll, oh2_t)
        got = np.asarray(run(pt[0], lb[0]))
        ok = "ok" if np.allclose(got, ref, atol=1e-3) else "MISMATCH"
        t = timeit(run, pt, lb)
        print(f"{name:24s}: {t * 1e3:7.2f} ms   [{ok}]")


if __name__ == "__main__":
    main()
