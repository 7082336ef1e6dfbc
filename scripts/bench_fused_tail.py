"""A/B the serving tail: argmax(full-res logits) vs fused upsample+argmax.

The BiSeNet serving program ends with x8 bilinear upsample -> (B, H, W, 19)
bf16 logits in HBM -> argmax. ops/upsample.py phase-decomposes the resize so
the W-phase arithmetic fuses into the argmax reduce and the full-res field is
never materialized. Question: how much of the end-to-end serving iteration
does that buy on v5e, bf16 and int8?

Protocol: compiled fori_loop over a 4-ring of inputs, one scalar fetch
(PERFORMANCE.md); 10 warmup + 50 timed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fused_tail.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 1024
WARMUP, ITERS = 10, 50


def timed_loop(fn, variables, batch):
    ring = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (4, batch, H, W, 3), np.uint8)
    ).astype(jnp.bfloat16)

    @jax.jit
    def loop(variables, ring, n):
        def body(i, acc):
            imgs = jax.lax.dynamic_index_in_dim(ring, i % 4, keepdims=False)
            return acc + fn(variables, imgs)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.int32))

    float(loop(variables, ring, WARMUP))
    t0 = time.perf_counter()
    float(loop(variables, ring, ITERS))
    return (time.perf_counter() - t0) / ITERS


def build(quant: bool):
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model

    cfg = ExperimentConfig()
    model = build_model(cfg.model)
    variables = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3), train=False)
    if quant:
        from rtda_semanticsegmentation_tpu.models.quantize import (
            calibrate,
            quantized_model,
        )

        rng = np.random.RandomState(7)
        calib = [
            (jnp.asarray(rng.randint(0, 256, (4, H, W, 3), np.uint8)) / 255.0 - 0.45)
            / 0.225
            for _ in range(3)
        ]
        variables = calibrate(cfg.model, variables, calib)
        model = quantized_model(cfg.model)
    return model, variables


def main():
    from rtda_semanticsegmentation_tpu.ops.upsample import upsample_bilinear_argmax

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    for quant in (False, True):
        model, variables = build(quant)

        def ref_tail(variables, imgs):
            logits = model.apply(variables, imgs, False)
            return jnp.sum(jnp.argmax(logits, -1))

        def fused_tail(variables, imgs):
            low = model.apply(variables, imgs, False, upsample=False)
            return jnp.sum(upsample_bilinear_argmax(low, (H, W)))

        def floor_tail(variables, imgs):
            # lower bound: no upsample at all — argmax at 1/8. The gap to
            # ref_tail is the ENTIRE tail budget a fused kernel could reclaim.
            low = model.apply(variables, imgs, False, upsample=False)
            return jnp.sum(jnp.argmax(low, -1))

        tag = "int8" if quant else "bf16"
        for batch in (32, 128):
            a = timed_loop(ref_tail, variables, batch)
            b = timed_loop(fused_tail, variables, batch)
            c = timed_loop(floor_tail, variables, batch)
            print(
                f"{tag} b{batch}: ref {batch / a:.1f} img/s ({a * 1e3:.2f} ms) | "
                f"fused {batch / b:.1f} img/s ({b * 1e3:.2f} ms) | "
                f"floor {batch / c:.1f} img/s ({c * 1e3:.2f} ms) | "
                f"tail budget {(a - c) * 1e3:.2f} ms ({(a - c) / a * 100:.0f}%)",
                flush=True,
            )

        # agreement probe (held-out input)
        probe = (
            jnp.asarray(
                np.random.RandomState(9).randint(0, 256, (2, H, W, 3), np.uint8)
            ).astype(jnp.bfloat16)
        )
        ref_p = jnp.argmax(model.apply(variables, probe, False), -1)
        fus_p = upsample_bilinear_argmax(
            model.apply(variables, probe, False, upsample=False), (H, W)
        )
        print(
            f"{tag} argmax agreement fused vs ref: "
            f"{float(jnp.mean(ref_p == fus_p)):.6f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
