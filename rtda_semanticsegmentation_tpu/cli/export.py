"""Export a trained model as an AOT serving artifact (StableHLO).

The reference has no deployment path (inference requires the full Python
codebase + a torch checkpoint). This emits a self-contained compiled
artifact — weights baked in, preprocessing + argmax inside the graph,
optionally a symbolic batch dimension — loadable with bare jax via
``serving.load_artifact`` or served with ``cli/predict.py --artifact``.

Usage::

    python -m rtda_semanticsegmentation_tpu.cli.export \
        --checkpoint_dir ./checkpoints --run_name bisenet --restore best \
        --size 512 1024 --precision int8 --calib_images ./frames \
        --output ./artifacts/bisenet_int8
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..config import ExperimentConfig, ModelConfig
from .predict import _load_variables, collect_images, decode_resize


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output", required=True, help="Artifact output directory.")
    p.add_argument("--model_name", choices=("bisenet", "deeplabv2"),
                   default="bisenet")
    p.add_argument("--bisenet_context_path", dest="context_path",
                   choices=("resnet18", "resnet101"), default="resnet18")
    p.add_argument("--checkpoint_dir", default=None,
                   help="Checkpoint root (as written by training). Omit to "
                        "export random weights (debug only).")
    p.add_argument("--run_name", default="",
                   help="Run subdirectory under --checkpoint_dir.")
    p.add_argument("--adversarial", action="store_true",
                   help="Checkpoint came from adversarial training (affects "
                        "the default run directory name).")
    p.add_argument("--restore", choices=("best", "latest"), default="best")
    p.add_argument("--pretrained_backbone", default=None,
                   help="Converted .npz backbone weights (debug runs).")
    p.add_argument("--size", type=int, nargs=2, default=(512, 1024),
                   metavar=("H", "W"), help="Serving input size.")
    p.add_argument("--batch", type=int, default=0,
                   help="Pin the artifact batch size; 0 (default) exports a "
                        "symbolic batch dimension (any batch at run time).")
    p.add_argument("--precision", choices=("bf16", "f32", "int8"),
                   default="bf16",
                   help="int8 = calibrated PTQ serving path (needs "
                        "--calib_images).")
    p.add_argument("--calib_images", default=None,
                   help="Image file/dir/glob used for int8 max-abs "
                        "calibration.")
    p.add_argument("--calib_batches", type=int, default=2)
    p.add_argument("--calib_batch_size", type=int, default=8)
    p.add_argument("--quant_clip", type=float, default=None,
                   help="int8 activation clip quantile; 1.0 = exact "
                        "max|x|; default: ModelConfig.quant_clip = 1.0. "
                        "Recorded in the artifact metadata so exports are "
                        "pinnable.")
    p.add_argument("--quant_min_ch", type=int, default=None,
                   help="int8 channel policy: only convs with at least this "
                        "many INPUT channels run on the s8 path (default "
                        "ModelConfig.quant_min_ch = 128; measured policy "
                        "sweep in scripts/bench_int8_policy.py).")
    p.add_argument("--quant_skip", type=str, nargs="*", default=None,
                   help="Module-path substrings kept on the bf16 path even "
                        "in int8 mode (e.g. ffm layer4).")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="Comma-separated lowering targets (default tpu,cpu).")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import dataclasses

    import jax.numpy as jnp

    from ..ops.augment import normalize_u8
    from ..serving import export_serving, save_artifact

    h, w = args.size
    dtype = {"bf16": "bfloat16", "f32": "float32", "int8": "bfloat16"}[
        args.precision
    ]
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

    from ..models.factory import build_model

    model = build_model(mcfg)
    variables = _load_variables(args, cfg, model, h, w)

    if args.precision == "int8":
        if not args.calib_images:
            print("--precision int8 requires --calib_images", file=sys.stderr)
            return 2
        from ..models.quantize import calibrate

        paths = collect_images(args.calib_images)
        if not paths:
            raise FileNotFoundError(
                f"no calibration images at {args.calib_images!r}"
            )
        bs = max(1, args.calib_batch_size)
        paths = paths[: max(1, args.calib_batches) * bs]
        calib = []
        for i in range(0, len(paths), bs):
            imgs = np.stack(
                [decode_resize(p, w, h)[0] for p in paths[i : i + bs]]
            )
            calib.append(normalize_u8(jnp.asarray(imgs), cfg.augment))
        variables = calibrate(mcfg, variables, calib)
        print(f"int8 calibration done ({len(calib)} batch(es))",
              file=sys.stderr)

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    blob, meta = export_serving(
        mcfg,
        cfg.augment,
        variables,
        height=h,
        width=w,
        batch=args.batch or None,
        precision=args.precision,
        platforms=platforms,
    )
    save_artifact(args.output, blob, meta)
    batch_desc = args.batch or "symbolic"
    print(
        f"exported {args.model_name}/{args.context_path} {args.precision} "
        f"@ {w}x{h} batch={batch_desc} platforms={','.join(platforms)} -> "
        f"{args.output} ({len(blob) / 1e6:.1f} MB)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
