"""Frozen vs live int8 PTQ serving: does calibration-time weight freezing
recover the per-forward weight work?

BENCH r4 measured the fidelity-ladder int8 path (per-channel fold +
unsigned grid + bias correction, all recomputed from f32 params inside the
jitted forward) at 1677 img/s b128 — down from the r2-era per-tensor
scheme's 2032. The recomputed weight work is batch-independent (~11M
params x several elementwise passes + a bias-correction einsum per conv),
so ``models/quantize.py::freeze`` folds it into per-conv constants
(wq, sw, c) once. This times bf16 / int8 / int8_frozen on the same trained
weights and probes frozen-vs-bf16 argmax agreement.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_int8_frozen.py
Results recorded in PERFORMANCE.md ("int8 PTQ fidelity gates" / headline).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench


def main() -> None:
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.quantize import quantized_model
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    print("training probe weights (23 learnable-synthetic steps) ...", flush=True)
    _, _, _, trained = bench._train_throughput("vanilla", 8)
    _, bf16_forward = bench._build()
    # _build_int8 calibrates + freezes (the serving default since r4); the
    # live-int8 comparison arm reuses its variables with the unfrozen model
    f_vars, frozen_forward, probe, _labels, _clip = bench._build_int8(trained)

    cfg = ExperimentConfig()
    q_vars = f_vars
    ml = quantized_model(cfg.model, frozen=False)

    @jax.jit
    def q_forward(variables, images):
        x = normalize_u8(images, cfg.augment).astype(jnp.bfloat16)
        return ml.apply(variables, x, False)

    a = jnp.argmax(bf16_forward(q_vars, probe), -1)
    b_live = jnp.argmax(q_forward(q_vars, probe), -1)
    b_froz = jnp.argmax(frozen_forward(f_vars, probe), -1)
    print(f"argmax agreement vs bf16: live int8 "
          f"{float(jnp.mean(a == b_live)):.4f}, frozen "
          f"{float(jnp.mean(a == b_froz)):.4f}; frozen vs live "
          f"{float(jnp.mean(b_live == b_froz)):.4f}", flush=True)

    for batch in (32, 128):
        rows = []
        for name, fwd, v in (
            ("bf16", bf16_forward, q_vars),
            ("int8 live", q_forward, q_vars),
            ("int8 frozen", frozen_forward, f_vars),
        ):
            sec, _ = bench._time_batch(fwd, v, batch)
            rows.append(f"{name} {batch / sec:7.1f} img/s ({sec * 1e3:.2f} ms)")
        print(f"b{batch}: " + " | ".join(rows), flush=True)


if __name__ == "__main__":
    bench._configure_cache()
    main()
