"""Batch inference CLI: segment a folder of images with a trained model.

The reference has no standalone prediction tool — inference exists only
inside the validation loop (``validation.py:25``) and the end-of-run W&B
gallery (``utils.py:563-645``). This closes that serving gap: decode ->
resize -> normalize -> jitted forward (bf16, f32, or calibrated int8 PTQ —
see ``models/quantize.py``) -> argmax -> trainId PNG + colorized PNG
(+ optional overlay), written next to each input's stem.

Usage::

    python -m rtda_semanticsegmentation_tpu.cli.predict \
        --images ./frames --output ./masks \
        --checkpoint_dir ./checkpoints --run_name bisenet --restore best \
        --precision int8 --overlay
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

from ..config import ExperimentConfig, ModelConfig
from ..data.labels import train_ids_to_rgb

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def collect_images(path: str) -> list:
    """A sorted list of image paths from a file, directory, or glob."""
    import glob as globmod

    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith(IMAGE_EXTS)
        )
    matches = sorted(globmod.glob(path))
    if not matches:
        raise FileNotFoundError(f"no images found at {path!r}")
    return matches


def decode_resize(path: str, w: int, h: int):
    """PIL decode -> RGB -> bilinear resize to (w, h).

    Returns ``(uint8 HWC array, original (W, H))``. The single decode used
    by serving, artifact serving, and int8 calibration (cli/export.py)."""
    from PIL import Image

    im = Image.open(path).convert("RGB")
    orig = im.size  # (W, H)
    return np.asarray(im.resize((w, h), Image.BILINEAR), np.uint8), orig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True,
                   help="Image file, directory, or glob.")
    p.add_argument("--output", required=True, help="Output directory.")
    p.add_argument("--artifact", default=None,
                   help="Serve from an AOT artifact exported by cli/export "
                        "instead of a checkpoint; model/size/precision flags "
                        "are then read from the artifact's metadata.")
    p.add_argument("--model_name", choices=("bisenet", "deeplabv2"),
                   default="bisenet")
    p.add_argument("--bisenet_context_path", dest="context_path",
                   choices=("resnet18", "resnet101"), default="resnet18")
    p.add_argument("--checkpoint_dir", default=None,
                   help="Checkpoint root (as written by training). Omit to "
                        "run with random weights (debug only).")
    p.add_argument("--run_name", default="",
                   help="Run subdirectory under --checkpoint_dir (defaults "
                        "to the training convention <model_name>[_adversarial"
                        "_GTA2City]).")
    p.add_argument("--adversarial", action="store_true",
                   help="Checkpoint came from adversarial training (affects "
                        "the default run directory name).")
    p.add_argument("--restore", choices=("best", "latest"), default="best")
    p.add_argument("--pretrained_backbone", default=None,
                   help="Converted .npz weights (convert_torch_weights): a "
                        "backbone for debug runs, or a --full conversion "
                        "of a reference-trained checkpoint to serve it "
                        "directly without any retraining.")
    p.add_argument("--size", type=int, nargs=2, default=(512, 1024),
                   metavar=("H", "W"), help="Model input size.")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--precision", choices=("bf16", "f32", "int8"),
                   default="bf16",
                   help="int8 = post-training-quantized serving path, "
                        "calibrated on the first --calib_batches batches of "
                        "the inputs themselves.")
    p.add_argument("--calib_batches", type=int, default=2)
    p.add_argument("--quant_clip", type=float, default=None,
                   help="int8 activation-scale clip quantile (1.0 = exact "
                        "max|x|; default: ModelConfig.quant_clip = 1.0 — exact "
                        "per-channel max measures best on trained weights).")
    p.add_argument("--quant_min_ch", type=int, default=None,
                   help="int8 channel policy: only convs with at least this "
                        "many INPUT channels run on the s8 path (default "
                        "ModelConfig.quant_min_ch = 128 — thin-channel "
                        "large-spatial convs are bandwidth-bound and int8 "
                        "measures SLOWER there; scripts/bench_int8_policy.py).")
    p.add_argument("--quant_skip", type=str, nargs="*", default=None,
                   help="Module-path substrings kept on the bf16 path even "
                        "in int8 mode (e.g. ffm layer4) — the fidelity/"
                        "throughput lever of scripts/probe_int8_layers.py.")
    p.add_argument("--overlay", action="store_true",
                   help="Also write a 60/40 image/mask blend per input.")
    p.add_argument("--no_resize_back", action="store_true",
                   help="Keep masks at the model size instead of resizing "
                        "back to each input's original resolution.")
    return p


def _load_variables(args, cfg: ExperimentConfig, model, h: int, w: int):
    if args.checkpoint_dir is not None:
        from ..train.checkpoint import CheckpointManager

        mgr = CheckpointManager(cfg, run_name=args.run_name)
        try:
            restored = mgr.restore_variables(which=args.restore)
        finally:
            mgr.close()
        if restored is None:
            raise FileNotFoundError(
                f"no '{args.restore}' checkpoint under {mgr.root}"
            )
        variables, meta = restored
        print(f"restored {args.restore} checkpoint from {mgr.root} "
              f"(epoch {meta['epoch']}, best mIoU {meta['best_miou']:.4f})",
              file=sys.stderr)
        return variables

    import jax

    from ..models.factory import init_model, load_pretrained_backbone

    variables = init_model(model, jax.random.PRNGKey(0), (1, h, w, 3),
                           train=False)
    if args.pretrained_backbone:
        variables = load_pretrained_backbone(
            variables, args.pretrained_backbone, cfg.model.name
        )
    else:
        print("WARNING: no --checkpoint_dir; predicting with random weights",
              file=sys.stderr)
    return variables


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..models.factory import build_model
    from ..ops.augment import normalize_u8

    if args.artifact:
        return _predict_with_artifact(args)

    h, w = args.size
    dtype = {"bf16": "bfloat16", "f32": "float32", "int8": "bfloat16"}[
        args.precision
    ]
    # On CPU hosts (tests, debug) bf16 is slow and noisy; the tests pass
    # --precision f32 explicitly, TPU runs keep bf16.
    mcfg = ModelConfig(
        name=args.model_name,
        context_path=args.context_path,
        compute_dtype=dtype,
        pretrained_backbone=None,
        **({"quant_clip": args.quant_clip}
           if args.quant_clip is not None else {}),
        **({"quant_min_ch": args.quant_min_ch}
           if args.quant_min_ch is not None else {}),
        **({"quant_skip": tuple(args.quant_skip)}
           if args.quant_skip is not None else {}),
    )
    cfg = ExperimentConfig(model=mcfg)
    if args.checkpoint_dir:
        cfg = cfg.replace(
            train=dataclasses.replace(
                cfg.train, checkpoint_dir=args.checkpoint_dir
            ),
            adversarial=dataclasses.replace(
                cfg.adversarial, enabled=args.adversarial
            ),
        )

    paths = collect_images(args.images)
    if not paths:
        raise FileNotFoundError(f"no images found at {args.images!r}")
    os.makedirs(args.output, exist_ok=True)
    print(f"{len(paths)} image(s) -> {args.output} "
          f"({args.precision}, {h}x{w}, batch {args.batch_size})",
          file=sys.stderr)

    model = build_model(mcfg)
    variables = _load_variables(args, cfg, model, h, w)

    def decode(path):
        return decode_resize(path, w, h)

    b = args.batch_size
    batches = [paths[i : i + b] for i in range(0, len(paths), b)]
    decoded_cache: dict = {}  # batch index -> [(img_u8, orig_size), ...]
    stems = _unique_stems(paths)

    apply_fn = model.apply
    if args.precision == "int8":
        from ..models.quantize import calibrate, freeze, quantized_model

        n_cal = max(1, min(args.calib_batches, len(batches)))
        calib = []
        for bi, chunk in enumerate(batches[:n_cal]):
            decoded_cache[bi] = [decode(p) for p in chunk]
            imgs = np.stack([d[0] for d in decoded_cache[bi]])
            calib.append(normalize_u8(jnp.asarray(imgs), cfg.augment))
        variables = freeze(mcfg, calibrate(mcfg, variables, calib))
        apply_fn = quantized_model(mcfg, frozen=True).apply
        print(f"int8 calibration done ({n_cal} batch(es))", file=sys.stderr)

    @jax.jit
    def forward(variables, images_u8):
        x = normalize_u8(images_u8, cfg.augment).astype(jnp.dtype(dtype))
        return jnp.argmax(apply_fn(variables, x, False), axis=-1)

    written = 0
    for bi, chunk in enumerate(batches):
        decoded = decoded_cache.pop(bi, None) or [decode(p) for p in chunk]
        imgs = np.stack([d[0] for d in decoded])
        if imgs.shape[0] < b:  # pad the tail batch: one compiled program
            pad = np.zeros((b - imgs.shape[0], h, w, 3), np.uint8)
            imgs = np.concatenate([imgs, pad])
        preds = np.asarray(forward(variables, jnp.asarray(imgs)), np.uint8)
        written += _write_outputs(args, decoded, chunk, preds, stems, h, w)
    print(f"wrote {written} prediction(s)", file=sys.stderr)
    return 0


def _unique_stems(paths) -> dict:
    """Unique output stems: inputs differing only by extension (a.png,
    a.jpg) must not clobber each other's masks."""
    stems, seen = {}, {}
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        if stem in seen:
            seen[stem] += 1
            stem = f"{stem}_{seen[stem]}"
        else:
            seen[stem] = 0
        stems[path] = stem
    return stems


def _write_outputs(args, decoded, chunk, preds, stems, h, w) -> int:
    """Write trainId/color (+ optional overlay) PNGs for one batch."""
    from PIL import Image

    written = 0
    for (img_u8, orig), path, pred in zip(decoded, chunk, preds):
        stem = stems[path]
        mask = Image.fromarray(pred, mode="L")
        color = Image.fromarray(train_ids_to_rgb(pred))
        if not args.no_resize_back and orig != (w, h):
            mask = mask.resize(orig, Image.NEAREST)
            color = color.resize(orig, Image.NEAREST)
        mask.save(os.path.join(args.output, f"{stem}_trainids.png"))
        color.save(os.path.join(args.output, f"{stem}_color.png"))
        if args.overlay:
            base = Image.open(path).convert("RGB")
            if args.no_resize_back:
                base = base.resize((w, h), Image.BILINEAR)
            blend = (
                0.6 * np.asarray(base, np.float32)
                + 0.4 * np.asarray(color, np.float32)
            ).astype(np.uint8)
            Image.fromarray(blend).save(
                os.path.join(args.output, f"{stem}_overlay.png")
            )
        written += 1
    return written


def _predict_with_artifact(args) -> int:
    """Serve a folder through an AOT artifact (cli/export.py output)."""
    from PIL import Image

    from ..serving import load_artifact

    fn, meta = load_artifact(args.artifact)
    h = int(meta.get("height", args.size[0]))
    w = int(meta.get("width", args.size[1]))
    # A pinned-batch artifact dictates the batch size (tail batches are
    # padded); a symbolic-batch artifact serves --batch_size directly.
    pinned = meta.get("batch")
    b = int(pinned) if pinned else args.batch_size
    paths = collect_images(args.images)
    if not paths:
        raise FileNotFoundError(f"no images found at {args.images!r}")
    os.makedirs(args.output, exist_ok=True)
    print(
        f"{len(paths)} image(s) -> {args.output} (artifact "
        f"{meta.get('model', '?')}/{meta.get('precision', '?')}, {h}x{w}, "
        f"batch {b}{' pinned' if pinned else ''})",
        file=sys.stderr,
    )
    stems = _unique_stems(paths)

    written = 0
    for i in range(0, len(paths), b):
        chunk = paths[i : i + b]
        decoded = [decode_resize(p, w, h) for p in chunk]
        imgs = np.stack([d[0] for d in decoded])
        if pinned and imgs.shape[0] < b:
            pad = np.zeros((b - imgs.shape[0], h, w, 3), np.uint8)
            imgs = np.concatenate([imgs, pad])
        preds = np.asarray(fn(imgs), np.uint8)
        written += _write_outputs(args, decoded, chunk, preds, stems, h, w)
    print(f"wrote {written} prediction(s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
