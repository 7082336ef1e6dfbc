"""TPU A/B: fused-epilogue Pallas s8 conv vs the native XLA int8 path vs bf16.

Round-5 follow-up to the HLO evidence (``probe_int8_chain_hlo.py``): the
native int8 serving path materializes each conv's s32 accumulator in HBM
(134 MB at b8 128x256x128) plus a second padded-s8 write, so a 4-conv chain
moves MORE bytes than bf16. The Pallas kernel keeps the accumulator and the
whole dequant/BN/ReLU/requantize epilogue in VMEM (s8 in -> s8 out).

Chains of 4 same-shape convs at BiSeNet trunk shapes, ring/fori protocol:

  bf16    : conv -> scale/shift -> relu (bf16 in/out, XLA-fused epilogue)
  xla_s8  : today's frozen path — bf16 in, per-conv quantize -> s8 conv
            (s32 accum in HBM) -> dequant/scale/relu -> bf16 out
  pallas  : one entry quantize, 4x fused s8->s8 kernels, bf16 exit value

Correctness: pallas chain output vs an XLA oracle of the same math.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_pallas_int8_conv.py
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

from rtda_semanticsegmentation_tpu.ops.pallas_conv_int8 import int8_conv3x3s1p1

ITERS = 50
SHAPES = [  # (B, H, W, C) — BiSeNet-R18 trunk stage shapes at 1024x512 input
    (8, 256, 128, 64),
    (8, 128, 64, 128),
    (8, 64, 32, 256),
    (8, 32, 16, 512),
]
DEPTH = 4


def timed(fn, *args) -> float:
    @jax.jit
    def loop(args, n):
        def body(i, acc):
            out = fn(*args, i)
            return acc + out
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(args, 5))
    t0 = time.perf_counter()
    float(loop(args, ITERS))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    for (B, H, W, C) in SHAPES:
        rng = np.random.RandomState(0)
        x_bf = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32), jnp.bfloat16)
        ws = [jnp.asarray(rng.randint(-127, 128, (3, 3, C, C)), jnp.int8)
              for _ in range(DEPTH)]
        wbf = [jnp.asarray((rng.rand(3, 3, C, C).astype(np.float32) - 0.5) * 0.1,
                           jnp.bfloat16) for _ in range(DEPTH)]
        a = jnp.asarray(rng.rand(C).astype(np.float32) * 2e-4 + 1e-4)
        b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.01)
        inv = jnp.full((C,), 120.0, jnp.float32)
        s_in = jnp.full((C,), 1.0 / 120.0, jnp.float32)

        # ring of 2 scaled inputs so nothing hoists
        ring = jnp.stack([x_bf, x_bf * 0.999])

        def pick(ring, i):
            return jax.lax.dynamic_index_in_dim(ring, i % 2, keepdims=False)

        def quant_in(x):  # bf16 value -> unsigned s8 codes (prologue)
            q = jnp.round(x.astype(jnp.float32) / s_in) - 127.0
            return jnp.clip(q, -127, 127).astype(jnp.int8)

        def bf16_chain(ring, ws_bf, i):
            x = pick(ring, i)
            for w in ws_bf:
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                x = jnp.maximum(
                    y.astype(jnp.float32) * a + b, 0.0
                ).astype(jnp.bfloat16)
            return jnp.sum(x.astype(jnp.float32))

        def xla_s8_chain(ring, ws_q, i):
            x = pick(ring, i)
            for w in ws_q:
                xq = quant_in(x)
                xq = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                             constant_values=jnp.int8(-127))
                acc = jax.lax.conv_general_dilated(
                    xq, w, (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                x = jnp.maximum(
                    acc.astype(jnp.float32) * a + b, 0.0
                ).astype(jnp.bfloat16)
            return jnp.sum(x.astype(jnp.float32))

        def pallas_chain(ring, ws_q, i):
            x = pick(ring, i)
            xq = quant_in(x)
            for k, w in enumerate(ws_q):
                last = k == len(ws_q) - 1
                xq = int8_conv3x3s1p1(
                    xq, w, a, b, None if last else inv, relu=True,
                )
            return jnp.sum(xq.astype(jnp.float32))

        t_bf = timed(bf16_chain, ring, wbf)
        t_xla = timed(xla_s8_chain, ring, ws)
        try:
            t_pal = timed(pallas_chain, ring, ws)
        except Exception as e:  # noqa: BLE001
            print(f"  pallas FAILED: {type(e).__name__}: {e}", flush=True)
            t_pal = float("nan")

        # per-conv marginal: subtract a depth-1 chain to drop entry costs
        def depth1(fn, ws_):
            return timed(fn, ring, ws_[:1])

        m_bf = (t_bf - depth1(bf16_chain, wbf)) / (DEPTH - 1)
        m_xla = (t_xla - depth1(xla_s8_chain, ws)) / (DEPTH - 1)
        m_pal = (
            (t_pal - depth1(pallas_chain, ws)) / (DEPTH - 1)
            if t_pal == t_pal else float("nan")
        )
        flops = 2 * B * H * W * C * C * 9
        print(
            f"({B},{H},{W},{C}) chain4: bf16 {t_bf*1e3:7.3f} ms | xla_s8 "
            f"{t_xla*1e3:7.3f} | pallas_s8 {t_pal*1e3:7.3f}  || marginal/conv "
            f"bf16 {m_bf*1e6:6.0f} us ({flops/m_bf/1e12:5.1f} TF/s) | xla_s8 "
            f"{m_xla*1e6:6.0f} ({flops/m_xla/1e12:5.1f}) | pallas "
            f"{m_pal*1e6:6.0f} ({flops/m_pal/1e12:5.1f})",
            flush=True,
        )

        # correctness on TPU (first shape only, cheap)
        if (B, H, W, C) == SHAPES[0]:
            xq0 = quant_in(x_bf)
            got = int8_conv3x3s1p1(xq0, ws[0], a, b, inv, relu=True)
            xp = jnp.pad(xq0, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         constant_values=jnp.int8(-127))
            acc = jax.lax.conv_general_dilated(
                xp, ws[0], (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            z = jnp.maximum(acc.astype(jnp.float32) * a + b, 0.0)
            want = (jnp.clip(jnp.round(z * inv), 0, 254) - 127).astype(jnp.int8)
            neq = int(jnp.sum(got != want))
            print(f"  correctness vs XLA oracle: {neq} mismatches of "
                  f"{got.size}", flush=True)


if __name__ == "__main__":
    main()
