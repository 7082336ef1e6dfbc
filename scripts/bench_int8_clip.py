"""int8 PTQ fidelity vs activation-clip quantile, on trained weights.

Round-2 finding: the max-abs activation calibration that reads 0.998
argmax agreement on PRNGKey(0) weights drops to 0.941 on briefly-trained
weights — trained ReLU nets grow heavy-tailed activations, and scaling
int8 to the absolute max spends the 8-bit budget on a handful of outlier
pixels. `ModelConfig.quant_clip` (ops/quant.py::calib_clip) instead clips
the calibrated scale to the q-quantile of |x|. This measures argmax
agreement (vs the bf16 forward, held-out probe batch — the bench.py gate)
across clip quantiles on the same 25-step-trained weights bench.py uses.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_int8_clip.py
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

CLIPS = (1.0, 0.9999, 0.999, 0.995, 0.99)


def main() -> None:
    import bench
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.factory import build_model
    from rtda_semanticsegmentation_tpu.models.quantize import (
        calibrate,
        quantized_model,
    )

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    # Same provenance as the bench gate: ~25 synthetic vanilla train steps.
    _, _, _, trained_vars = bench._train_throughput("vanilla")
    cfg = ExperimentConfig()
    model = build_model(cfg.model)

    H, W = bench.H, bench.W
    rng = np.random.RandomState(7)

    def batch():
        return (
            jnp.asarray(rng.randint(0, 256, (4, H, W, 3), np.uint8)) / 255.0
            - 0.45
        ) / 0.225

    calib_batches = [batch() for _ in range(3)]
    probe = batch().astype(jnp.bfloat16)  # held out: drawn after calibration

    @jax.jit
    def bf16_forward(v, im):
        return jnp.argmax(model.apply(v, im, False), -1)

    ref = bf16_forward(trained_vars, probe)

    for clip in CLIPS:
        mcfg = dataclasses.replace(cfg.model, quant_clip=clip)
        q_vars = calibrate(mcfg, trained_vars, calib_batches)
        mq = quantized_model(mcfg)

        @jax.jit
        def q_forward(v, im):
            return jnp.argmax(mq.apply(v, im, False), -1)

        agree = float(jnp.mean(ref == q_forward(q_vars, probe)))
        gate = "PASS" if agree >= 0.99 else "fail"
        print(f"clip={clip:<7} agreement={agree:.4f}  [{gate} @0.99]")


if __name__ == "__main__":
    main()
