"""ColorJitter cost variants: where do the ~20 ms (b32 @ 512x1024) go?

The b32 aug breakdown (bench_aug_breakdown) charges ColorJitter +19.8 ms of
the +26.9 ms full-aug delta, and a shared-subexpression select_n restructure
measured a wash (+20.25 — XLA CSE was already sharing). Hypothesis: the cost
is HBM traffic of the 4 sequential steps' materialized candidates at f32 —
and the reference's own albumentations pipeline runs this math on *uint8*
(per-op LUT rounding), so f32 is over-spec; bf16 (rel. step 2^-8 ~ the u8
grid's 1/255) halves the bytes.

Variants timed standalone (vmapped over the batch, ring/fori protocol,
the color_jitter call + the u8->float and normalize glue so dtype casts are
attributed):
  f32        current pipeline dtype
  bf16       image field math in bf16 (stats reductions in f32)
  f32_nohue  hue replaced with identity (sizes the HSV round trips)
  bf16_nohue both

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_cj_variants.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

H, W, BATCH = 512, 1024, 32
ITERS = 20


def time_fori(fn, *args) -> float:
    @jax.jit
    def loop(args, n):
        def body(i, acc):
            return acc + fn(*args, i)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(args, 3))
    t0 = time.perf_counter()
    float(loop(args, ITERS))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    from rtda_semanticsegmentation_tpu.config import AugmentConfig
    from rtda_semanticsegmentation_tpu.ops import augment as A

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    cfg = AugmentConfig()
    rng = np.random.RandomState(0)
    ring = jnp.asarray(
        rng.randint(0, 256, (2, BATCH, H, W, 3), np.uint8)
    )

    def make(dtype, with_hue):
        def prog(ring, i):
            imgs = jax.lax.dynamic_index_in_dim(ring, i % 2, keepdims=False)
            x = imgs.astype(dtype) / dtype(255.0)
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), i), BATCH)

            def per_image(img, k):
                if with_hue:
                    return A.color_jitter(img, k, cfg)
                # hue elided: sizes the HSV round trips' share
                k_ord, k_b, k_c, k_s, _ = jax.random.split(k, 5)
                fb = jax.random.uniform(k_b, minval=0.7, maxval=1.3)
                fc = jax.random.uniform(k_c, minval=0.7, maxval=1.3)
                fs = jax.random.uniform(k_s, minval=0.7, maxval=1.3)
                order = jax.random.permutation(k_ord, 4)

                def step(i2, im):
                    gray = im @ jnp.asarray(A._GRAY_WEIGHTS, im.dtype)
                    mean = jnp.mean(gray, dtype=jnp.float32).astype(im.dtype)
                    return jax.lax.select_n(
                        order[i2],
                        A._brightness(im, fb.astype(im.dtype)),
                        A._blend(im, jnp.full_like(im, mean), fc.astype(im.dtype)),
                        A._blend(im, jnp.broadcast_to(gray[..., None], im.shape),
                                 fs.astype(im.dtype)),
                        im,
                    )

                return jax.lax.fori_loop(0, 4, step, img)

            out = jax.vmap(per_image)(x, keys)
            return jnp.sum(out, dtype=jnp.float32) * 1e-12

        return prog

    for name, dtype, with_hue in (
        ("f32", jnp.float32, True),
        ("bf16", jnp.bfloat16, True),
        ("f32_nohue", jnp.float32, False),
        ("bf16_nohue", jnp.bfloat16, False),
    ):
        sec = time_fori(make(dtype, with_hue), ring)
        print(f"{name:11s} {sec * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
