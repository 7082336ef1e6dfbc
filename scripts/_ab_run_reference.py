"""Run the ACTUAL reference orchestrator (``/root/reference/main.py`` or
``main_adversarial.py``) on CPU against tiny on-disk fixtures, recording its
per-step/per-epoch metrics via the recording wandb shim.

Invoked as a subprocess by ``scripts/ab_reference.py`` with a scratch cwd
(the reference writes ``./checkpoints`` relative to ``ROOT_DIR='.'``).

The reference hard-codes two experiment knobs in ``config.py`` that its CLI
cannot override — the active augmentation pipeline (``config.py:265``) and
``USE_LOVASZ_LOSS`` (``config.py:290``) — and its ``main()`` calls
``importlib.reload(cfg)`` before reading them (``main.py:119``), wiping any
ahead-of-time monkeypatch. We therefore wrap ``importlib.reload`` so our
overrides re-apply immediately after every reload, exactly as a user editing
``config.py`` would have pinned them.

Overrides applied (all A/B-motivated, none semantic):

- ``GTA5_TRAIN_TRANSFORMS`` -> the deterministic ``no_new_aug`` pipeline
  rebuilt at the fixture size (the A/B premise: no stochastic augmentation,
  so trajectories are RNG-free given identical weights + data).
- Image sizes -> the fixture size (fixtures are written at exactly this
  size, so every Resize is the identity and no resampler parity enters).
- ``BATCH_SIZE`` == fixture-set size -> ONE batch per epoch, which makes
  the torch DataLoader's shuffle order irrelevant (every loss/BN/optimizer
  computation is permutation-invariant across the batch dimension).
- ``DATALOADER_NUM_WORKERS=0`` (1-core runner), checkpoint/image logging
  frequencies pushed out, latency loop shortened.
"""

import argparse
import importlib
import os
import sys


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", required=True, choices=(
        "vanilla", "lovasz", "adversarial", "adversarial_lovasz"))
    p.add_argument("--gta5", required=True)
    p.add_argument("--cityscapes", required=True)
    p.add_argument("--epochs", type=int, required=True)
    p.add_argument("--batch_size", type=int, required=True)
    p.add_argument("--height", type=int, required=True)
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--resume", required=True,
                   help="reference-format init checkpoint (epoch=-1)")
    p.add_argument("--shims", required=True)
    p.add_argument("--reference", default="/root/reference")
    return p.parse_args()


def main():
    args = parse_args()
    sys.path.insert(0, args.shims)
    sys.path.insert(0, args.reference)

    import albumentations as A
    from albumentations.pytorch import ToTensorV2

    def apply_overrides(cfg):
        h, w = args.height, args.width
        cfg.GTA5_IMG_HEIGHT, cfg.GTA5_IMG_WIDTH = h, w
        cfg.CITYSCAPES_IMG_HEIGHT, cfg.CITYSCAPES_IMG_WIDTH = h, w
        pipeline = A.Compose([
            A.Resize(height=h, width=w),
            A.Normalize(mean=cfg.NORM_MEAN, std=cfg.NORM_STD),
            ToTensorV2(),
        ])
        cfg.GTA5_TRAIN_TRANSFORMS = pipeline
        cfg.CITYSCAPES_TRAIN_TRANSFORMS = pipeline
        cfg.CITYSCAPES_VAL_TRANSFORMS = pipeline
        cfg.USE_LOVASZ_LOSS = args.mode in ("lovasz", "adversarial_lovasz")
        cfg.BATCH_SIZE = args.batch_size
        cfg.DATALOADER_NUM_WORKERS = 0
        cfg.SAVE_CHECKPOINT_FREQ_EPOCH = 0
        cfg.WANDB_LOG_IMAGES_FREQ_EPOCH = 10 ** 9
        cfg.LATENCY_ITERATIONS = 2
        cfg.WARMUP_ITERATIONS = 1
        return cfg

    real_reload = importlib.reload

    def patched_reload(mod):
        mod = real_reload(mod)
        if getattr(mod, "__name__", "") == "config":
            apply_overrides(mod)
        return mod

    importlib.reload = patched_reload

    import config as cfg

    apply_overrides(cfg)

    if args.mode in ("vanilla", "lovasz"):
        sys.argv = [
            "main.py",
            "--model_name", "bisenet",
            "--epochs", str(args.epochs),
            "--gta5_dataset_path", args.gta5,
            "--cityscapes_dataset_path", args.cityscapes,
            "--resume_checkpoint", args.resume,
        ]
        import main

        main.main()
    else:
        sys.argv = [
            "main_adversarial.py",
            "--generator_model", "bisenet",
            "--epochs", str(args.epochs),
            "--gta5_path", args.gta5,
            "--cityscapes_path", args.cityscapes,
            "--resume_checkpoint", args.resume,
        ]
        import main_adversarial

        main_adversarial.main_adversarial()


if __name__ == "__main__":
    main()
