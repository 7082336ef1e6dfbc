"""Run OUR trainer for the reference A/B on CPU (forced in-process — the
sitecustomize on this runner pins JAX_PLATFORMS=axon, and env vars alone do
not override it). Invoked as a subprocess by ``scripts/ab_reference.py``.

Parity pins (vs the defaults): ``--lovasz_impl sort`` (the exact reference
formulation; 'binned' is the TPU-fast default with a documented gradient
bias), ``--compute_dtype float32`` (the reference on CPU runs full f32 —
no GradScaler, ``main.py:304-310``), ``no_new_aug``.
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", required=True, choices=(
        "vanilla", "lovasz", "adversarial", "adversarial_lovasz"))
    p.add_argument("--gta5", required=True)
    p.add_argument("--cityscapes", required=True)
    p.add_argument("--epochs", type=int, required=True)
    p.add_argument("--batch_size", type=int, required=True)
    p.add_argument("--height", type=int, required=True)
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--init_g", required=True, help="converted init .npz")
    p.add_argument("--init_d", default=None)
    p.add_argument("--log_dir", required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--repo", default="/root/repo")
    args = p.parse_args()

    sys.path.insert(0, args.repo)

    # single-device CPU regardless of caller env: under pytest the inherited
    # XLA_FLAGS=--xla_force_host_platform_device_count=8 would give this
    # subprocess an 8-way data mesh and reject the tiny A/B batch size
    import os

    os.environ.pop("XLA_FLAGS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")

    size = [str(args.height), str(args.width)]
    common = [
        "--epochs", str(args.epochs),
        "--batch_size", str(args.batch_size),
        "--gta5_dataset_path", args.gta5,
        "--cityscapes_dataset_path", args.cityscapes,
        "--train_dataset", "gta5",
        "--val_dataset", "cityscapes",
        "--augmentation", "no_new_aug",
        "--lovasz_impl", "sort",
        "--compute_dtype", "float32",
        "--pretrained_backbone", args.init_g,
        "--checkpoint_dir", args.checkpoint_dir,
        "--log_backend", "jsonl",
        "--log_dir", args.log_dir,
        "--run_name", args.mode,
        "--num_workers", "0",
        "--no_perf",
        "--train_size", *size,
        "--eval_size", *size,
    ]
    if args.mode in ("lovasz", "adversarial_lovasz"):
        common.append("--use_lovasz")

    if args.mode in ("vanilla", "lovasz"):
        from rtda_semanticsegmentation_tpu.cli.train import main as run

        run(["--model_name", "bisenet"] + common)
    else:
        from rtda_semanticsegmentation_tpu.cli.train_adversarial import (
            main as run,
        )

        run([
            "--generator_model", "bisenet",
            "--pretrained_discriminator", args.init_d,
        ] + common)


if __name__ == "__main__":
    main()
