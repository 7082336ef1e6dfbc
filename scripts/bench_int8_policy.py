"""End-to-end int8 channel-policy sweep (round 5).

The per-conv chain A/B (``bench_pallas_int8_conv.py``) measured the native
int8 conv LOSING 2x to bf16 at the 64-channel large-spatial shapes (663 vs
321 us/conv at 256x128 sp) while WINNING 1.5-1.9x at >=128 channels — the
64-ch convs are bandwidth-bound and the s32-accumulator HBM round trip +
quantize prologue swamp the MXU saving. Those convs (layer1, spatial-path
convblock2) are quantized under the r4 policy (quant_min_ch=64).

This sweeps the serve-equivalent frozen-int8 program at b128 across
channel policies and reports throughput + fidelity vs the bf16 path, on
briefly-trained weights (same recipe as bench.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_int8_policy.py
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # repo-root bench.py: reuse its builders and protocol

POLICIES = [
    ("r4_min64", dict(quant_min_ch=64, quant_skip=())),
    ("min128", dict(quant_min_ch=128, quant_skip=())),
    ("min128_skip_ffm", dict(quant_min_ch=128, quant_skip=("ffm",))),
    ("min64_skip_thin", dict(
        quant_min_ch=64,
        # keep 64-in convs EXCEPT the large-spatial ones measured losing:
        # layer1 (256x128 sp) and the spatial path (512x256 -> 256x128)
        quant_skip=("layer1", "spatial_path"),
    )),
]
BATCHES = (128, 256)


def main() -> None:
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.quantize import (
        calibrate,
        freeze,
        quantized_model,
    )
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8
    from rtda_semanticsegmentation_tpu.ops.metrics import (
        confusion_matrix,
        per_class_iou_np,
    )

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    variables, bf16_forward = bench._build()
    # trained weights for realistic activation ranges (bench.py recipe)
    t0 = time.perf_counter()
    _, _, _, trained = bench._train_throughput("vanilla", 8)
    print(f"[{time.perf_counter()-t0:.0f}s] trained weights ready", flush=True)

    # bf16 baseline rows (same session)
    for b in BATCHES:
        sec, _ = bench._time_batch(bf16_forward, trained, b)
        print(f"bf16 b{b}: {b/sec:.1f} img/s ({sec*1e3:.2f} ms)", flush=True)

    cfg0 = ExperimentConfig()
    rng = np.random.RandomState(7)

    def u8():
        return bench._learnable_batch(rng, 4, bench.H, bench.W)

    calib_batches = [
        normalize_u8(jnp.asarray(u8()[0]), cfg0.augment).astype(jnp.bfloat16)
        for _ in range(3)
    ]
    probe_imgs, probe_labels = u8()
    probe_imgs = jnp.asarray(probe_imgs)
    a_ref = jnp.argmax(bf16_forward(trained, probe_imgs), -1)
    iou_bf = per_class_iou_np(
        np.asarray(confusion_matrix(jnp.asarray(probe_labels), a_ref, 19),
                   np.int64)
    )

    for name, pol in POLICIES:
        mcfg = dataclasses.replace(cfg0.model, **pol)
        try:
            v = calibrate(mcfg, trained, calib_batches)
            v = freeze(mcfg, v)
            mq = quantized_model(mcfg, frozen=True)

            @jax.jit
            def fwd(v, images, mq=mq):
                x = normalize_u8(images, cfg0.augment).astype(jnp.bfloat16)
                return mq.apply(v, x, False)

            bq = jnp.argmax(fwd(v, probe_imgs), -1)
            agree = float(jnp.mean(a_ref == bq))
            iou_q = per_class_iou_np(
                np.asarray(
                    confusion_matrix(jnp.asarray(probe_labels), bq, 19),
                    np.int64,
                )
            )
            dmiou = abs(float(np.mean(iou_bf)) - float(np.mean(iou_q)))
            row = f"{name:16s} agree={agree:.4f} dmIoU={dmiou*100:.3f}pts"
            for b in BATCHES:
                sec, _ = bench._time_batch(fwd, v, b)
                row += f" | b{b}: {b/sec:7.1f} img/s"
            print(row, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
