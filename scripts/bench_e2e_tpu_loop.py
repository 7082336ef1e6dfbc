"""End-to-end training-loop throughput on the REAL TPU.

Every other TPU number isolates the compiled step from device-resident
inputs (as the reference's profiler does). This drives the actual
production path — ``run_experiment``: host decode (or decoded-sample
cache) -> uint8 H2D -> on-device augmentation -> train step -> epoch-end
batched validation -> checkpointing — on synthetic on-disk fixtures at
training resolution, and reports wall-clock images/sec per epoch.

On this 1-core runner the first epoch is decode-bound (~12 samples/s/
thread from PNG); ``--decoded_cache_dir`` makes later epochs read raw
post-resize bytes (measured 552 samples/s/thread), so epoch 2+ approaches
the device step rate. A production host (v5e: ~28 vCPU/chip) reaches the
same state with `data.num_workers` threads from epoch 1.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_e2e_tpu_loop.py
Results: PERFORMANCE.md "End-to-end loop on TPU".
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

H, W = 512, 1024
N_IMAGES = 64
BATCH = 8
EPOCHS = 3


def main() -> None:
    import bench

    bench._configure_cache()
    import jax

    from ab_reference import make_fixtures

    from rtda_semanticsegmentation_tpu.config import get_preset
    from rtda_semanticsegmentation_tpu.train.loop import run_experiment

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    out = "/tmp/e2e_tpu_loop"
    gta, cs = make_fixtures(os.path.join(out, "data"), N_IMAGES, H, W)

    cfg = get_preset("bisenet_source_aug")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, pretrained_backbone=None),
        data=dataclasses.replace(
            cfg.data,
            train_dataset="gta5",
            val_dataset="cityscapes",
            gta5_path=gta,
            cityscapes_path=cs,
            gta5_size=(H, W),
            cityscapes_size=(H, W),
            eval_batch_size=BATCH,
            decoded_cache_dir=os.path.join(out, "cache"),
        ),
        train=dataclasses.replace(
            cfg.train,
            batch_size=BATCH,
            epochs=EPOCHS,
            checkpoint_dir=os.path.join(out, "ckpt"),
            validate_freq_epoch=1,
            print_freq_batch=1000,
            latency_iterations=0,
            warmup_iterations=0,
        ),
        obs=dataclasses.replace(
            cfg.obs, backend="jsonl", log_dir=os.path.join(out, "logs")
        ),
    )

    t0 = time.perf_counter()
    # the loop prints its own per-epoch wall "(Ns)" lines — epoch 1 is the
    # PNG-decode + compile epoch; epoch 2+ reads the decoded cache
    report = run_experiment(cfg, run_name="e2e_tpu", measure_performance=False)
    total = time.perf_counter() - t0

    steps = N_IMAGES // BATCH
    print(f"total wall {total:.1f}s for {EPOCHS} epochs x {steps} steps "
          f"(batch {BATCH}, {N_IMAGES} fixtures @ {W}x{H}); divide the "
          f"per-epoch '(Ns)' prints above by {N_IMAGES} images for "
          f"end-to-end img/s", flush=True)
    print(f"best mIoU {report.get('best_miou'):.4f}", flush=True)


if __name__ == "__main__":
    main()
