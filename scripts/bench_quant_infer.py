"""Full-model A/B: bf16 vs int8-PTQ BiSeNet inference throughput on TPU.

The chained-conv probe (bench_int8_conv.py) measured s8 convs 1.7-1.9x
faster at the 128/256-channel shapes and ~1.2x at 64ch; this script measures
the end-to-end win on the real model at 1024x512, plus the on-device argmax
agreement between the two paths (quantization fidelity).

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_quant_infer.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 1024
WARMUP, ITERS = 5, 50


def _throughput(forward, variables, batch):
    ring = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (4, batch, H, W, 3), np.uint8)
    ).astype(jnp.bfloat16)

    @jax.jit
    def loop(variables, ring, n):
        def body(i, acc):
            imgs = jax.lax.dynamic_index_in_dim(ring, i % 4, keepdims=False)
            out = forward(variables, imgs)
            return acc + jnp.sum(jnp.argmax(out, -1))

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.int32))

    float(loop(variables, ring, WARMUP))
    t0 = time.perf_counter()
    float(loop(variables, ring, ITERS))
    return batch * ITERS / (time.perf_counter() - t0)


def main():
    import argparse
    import dataclasses

    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model
    from rtda_semanticsegmentation_tpu.models.quantize import calibrate, quantized_model

    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("bisenet", "deeplabv2"),
                   default="bisenet")
    p.add_argument("--batches", default="8,16,32,64",
                   help="comma-separated batch sizes to sweep")
    args = p.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    cfg = ExperimentConfig()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, name=args.model))
    model = build_model(cfg.model)
    variables = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3), train=False)

    # calibrate on a few random uint8-scaled batches (distributional stand-in;
    # real use calibrates on val images via models/quantize.py)
    rng = np.random.RandomState(1)
    calib = [
        (jnp.asarray(rng.randint(0, 256, (4, H, W, 3), np.uint8)) / 255.0 - 0.45)
        / 0.225
        for _ in range(3)
    ]
    variables = calibrate(cfg.model, variables, calib)

    mq = quantized_model(cfg.model)

    def fwd_bf16(v, x):
        return model.apply(v, x, False)

    def fwd_int8(v, x):
        return mq.apply(v, x, False)

    # fidelity: on-device argmax agreement on a HELD-OUT batch (drawn after
    # the calibration set, so calibrated clipping is exercised)
    x = (
        (jnp.asarray(rng.randint(0, 256, (4, H, W, 3), np.uint8)) / 255.0 - 0.45)
        / 0.225
    ).astype(jnp.bfloat16)
    a = jnp.argmax(jax.jit(fwd_bf16)(variables, x), -1)
    b = jnp.argmax(jax.jit(fwd_int8)(variables, x), -1)
    print(f"argmax agreement: {float(jnp.mean(a == b)):.4f}", file=sys.stderr)

    for batch in (int(b) for b in args.batches.split(",")):
        r_bf = _throughput(fwd_bf16, variables, batch)
        r_q = _throughput(fwd_int8, variables, batch)
        print(
            f"batch={batch}: bf16 {r_bf:7.1f} img/s   int8 {r_q:7.1f} img/s "
            f"({r_q / r_bf:.2f}x)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
