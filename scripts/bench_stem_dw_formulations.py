"""dW-formulation microbench for the RGB-stem convs (VERDICT r4 #3 "act once").

The b32 per-op backward profile (scripts/profile_backward_ops.py) shows the
few-channel dW convs well off their bandwidth floor: stem 7x7/s2 3->64 dW
3.8 ms and spatial convblock1 3x3/s2 3->64 dW 3.6 ms vs ~0.8 ms of pure
operand traffic — XLA lowers them via the multiply+reduce emitter. This
times alternative same-math formulations for dW = d(conv(x, w))/dw:

  F1 autodiff     — jax.grad default (the production path)
  F2 patches+dot  — conv_general_dilated_patches -> (P, kh*kw*ci) @ (P, co)
                    dot (materializes the 49x/9x patch tensor)
  F3 tap loop     — kh*kw shifted strided slices of x, each contracted
                    against dy via dot_general over (b, oh, ow)

Every formulation computes identical sums (up to f32 reassociation); if
none beats F1, the multiply+reduce emitter IS the layout floor for
3-channel dW and the profile's "off-floor" reading is a bandwidth
miscount, closing the item with evidence either way.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_stem_dw_formulations.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 20
CASES = [  # (name, B, H, W, ci, co, k, stride, pad)
    ("stem7x7s2", 32, 512, 1024, 3, 64, 7, 2, 3),
    ("cb1_3x3s2", 32, 512, 1024, 3, 64, 3, 2, 1),
    ("cb2_3x3s2", 32, 256, 512, 64, 128, 3, 2, 1),
]


def timed(fn, *args) -> float:
    @jax.jit
    def loop(args, n):
        def body(i, acc):
            out = fn(*args, i)
            return acc + out

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(args, 3))
    t0 = time.perf_counter()
    float(loop(args, ITERS))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    for name, B, H, W, ci, co, k, s, p in CASES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(B, H, W, ci).astype(np.float32), jnp.bfloat16)
        Ho, Wo = (H + 2 * p - k) // s + 1, (W + 2 * p - k) // s + 1
        dy = jnp.asarray(
            rng.rand(B, Ho, Wo, co).astype(np.float32) - 0.5, jnp.bfloat16
        )
        w0 = jnp.asarray(
            rng.rand(k, k, ci, co).astype(np.float32) * 0.1, jnp.float32
        )
        ring = jnp.stack([x, x * 0.999])

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w.astype(jnp.bfloat16), (s, s), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def f1_autodiff(ring, dy, w0, i):
            x = jax.lax.dynamic_index_in_dim(ring, i % 2, keepdims=False)
            _, vjp = jax.vjp(lambda w: conv(x, w), w0)
            (dw,) = vjp(dy)
            return jnp.sum(dw.astype(jnp.float32)) * 1e-6

        def f2_patches(ring, dy, i):
            x = jax.lax.dynamic_index_in_dim(ring, i % 2, keepdims=False)
            patches = jax.lax.conv_general_dilated_patches(
                x, (k, k), (s, s), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (B, Ho, Wo, ci*k*k)
            dw = jax.lax.dot_general(
                patches.reshape(-1, patches.shape[-1]),
                dy.reshape(-1, co),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (ci*k*k, co)
            return jnp.sum(dw) * 1e-6

        def f3_taps(ring, dy, i):
            x = jax.lax.dynamic_index_in_dim(ring, i % 2, keepdims=False)
            xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            dyf = dy.reshape(-1, co)
            parts = []
            for kh in range(k):
                for kw in range(k):
                    tap = jax.lax.slice(
                        xp,
                        (0, kh, kw, 0),
                        (B, kh + (Ho - 1) * s + 1, kw + (Wo - 1) * s + 1, ci),
                        (1, s, s, 1),
                    )  # (B, Ho, Wo, ci)
                    parts.append(
                        jax.lax.dot_general(
                            tap.reshape(-1, ci), dyf,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
            dw = jnp.stack(parts).reshape(k, k, ci, co)
            return jnp.sum(dw) * 1e-6

        t1 = timed(f1_autodiff, ring, dy, w0)
        try:
            t2 = timed(f2_patches, ring, dy)
        except Exception as e:  # noqa: BLE001
            print(f"  f2 failed: {e}", flush=True)
            t2 = float("nan")
        try:
            t3 = timed(f3_taps, ring, dy)
        except Exception as e:  # noqa: BLE001
            print(f"  f3 failed: {e}", flush=True)
            t3 = float("nan")
        floor_mb = (x.nbytes + dy.nbytes) / 1e6
        print(f"{name}: autodiff {t1*1e3:7.2f} ms | patches+dot {t2*1e3:7.2f} "
              f"| tap-dots {t3*1e3:7.2f}   (operand floor ~{floor_mb/819:.2f} "
              f"ms @819GB/s)", flush=True)


if __name__ == "__main__":
    main()
