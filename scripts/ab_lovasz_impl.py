"""Binned-vs-sort Lovász convergence A/B (matched seed, matched data).

Context: the TPU-fast ``lovasz_impl='binned'`` default has a systematic
~0.94 gradient cosine vs the exact sort formulation regardless of bin count
(``ops/losses.py`` binning construction; ``scripts/check_lovasz_bins_accuracy.py``).
Loss VALUES agree to ~4e-5; the open question was whether the gradient bias
changes where training CONVERGES. This script answers it empirically:
identical init (same seed), identical on-disk 19-class fixtures
(``ab_reference.make_fixtures``), identical schedule — one run per impl per
mode — then compares the validation mIoU trajectories and final values.

Runs through the real CLI-level path (``run_experiment``), so the A/B
covers the full step (aug off, ``no_new_aug``) rather than an isolated
loss call.

Usage::

    # CPU (small size, ~20 min warm)
    python scripts/ab_lovasz_impl.py --device cpu

    # TPU at training size (run with run_in_background; one TPU user at a time)
    python scripts/ab_lovasz_impl.py --device tpu --size 512 1024 \
        --n_images 16 --batch 8 --epochs 50

Results: table on stdout + JSON at ``<out>/lovasz_ab.json``; conclusions
recorded in PERFORMANCE.md ("Binned-vs-sort Lovász convergence").
"""

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def build_cfg(mode, impl, gta, cs, size, batch, epochs, out, seed=0):
    """``impl``: 'sort' (exact), 'binned' (fg/bg-split backward, the r5
    default), or 'binned_avg' (the r4 bucket-average backward)."""
    from rtda_semanticsegmentation_tpu.config import get_preset

    preset = (
        "bisenet_adversarial_lovasz" if mode == "adversarial_lovasz"
        else "bisenet_source_small"
    )
    lovasz_impl = "sort" if impl == "sort" else "binned"
    lovasz_interp = impl == "binned"
    cfg = get_preset(preset)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, pretrained_backbone=None),
        data=dataclasses.replace(
            cfg.data,
            train_dataset="gta5",
            val_dataset="cityscapes",
            gta5_path=gta,
            cityscapes_path=cs,
            gta5_size=tuple(size),
            cityscapes_size=tuple(size),
            num_workers=0,
            eval_batch_size=batch,
        ),
        augment=dataclasses.replace(cfg.augment, pipeline="no_new_aug"),
        loss=dataclasses.replace(
            cfg.loss, use_lovasz=True, lovasz_impl=lovasz_impl,
            lovasz_interp=lovasz_interp,
        ),
        train=dataclasses.replace(
            cfg.train,
            batch_size=batch,
            epochs=epochs,
            seed=seed,
            # seed in the path: run_experiment auto-resumes from existing
            # checkpoints, so reusing a dir across seeds silently replays
            # the previous run's final state instead of training
            checkpoint_dir=os.path.join(out, f"ckpt_{mode}_{impl}_s{seed}"),
            validate_freq_epoch=max(1, epochs // 10),
            print_freq_batch=1000,
            save_checkpoint_freq_epoch=10 ** 6,
            latency_iterations=0,
            warmup_iterations=0,
        ),
        obs=dataclasses.replace(
            cfg.obs, backend="jsonl", log_dir=os.path.join(out, "logs")
        ),
    )
    return cfg


def val_curve(jsonl_path):
    rows = []
    with open(jsonl_path) as f:
        for line in f:
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "val/mIoU" in obj:
                rows.append((obj["step"], obj["val/mIoU"]))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--modes", nargs="+",
                   default=["lovasz", "adversarial_lovasz"])
    p.add_argument("--device", choices=("cpu", "tpu"), default="cpu")
    p.add_argument("--size", type=int, nargs=2, default=(64, 128),
                   metavar=("H", "W"))
    p.add_argument("--n_images", type=int, default=16)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--seed", type=int, default=0,
                   help="train seed (init + shuffle); fixtures stay fixed "
                        "so extra seeds replicate the binned-vs-sort delta "
                        "on identical data")
    p.add_argument("--impls", nargs="+", default=["binned", "sort"],
                   choices=("binned", "binned_avg", "sort"),
                   help="'binned' = fg/bg-split backward (r5 default); "
                        "'binned_avg' = r4 bucket-average backward.")
    p.add_argument("--out", default="/tmp/ab_lovasz")
    args = p.parse_args(argv)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ab_reference import make_fixtures

    from rtda_semanticsegmentation_tpu.train.loop import run_experiment

    os.makedirs(args.out, exist_ok=True)
    h, w = args.size
    gta, cs = make_fixtures(
        os.path.join(args.out, "data"), args.n_images, h, w
    )

    results = {}
    for mode in args.modes:
        for impl in args.impls:
            run_name = f"{mode}_{impl}_s{args.seed}"
            print(f"=== {run_name} ({args.epochs} epochs x "
                  f"{args.n_images // args.batch} steps) ===", flush=True)
            cfg = build_cfg(mode, impl, gta, cs, args.size, args.batch,
                            args.epochs, args.out, seed=args.seed)
            report = run_experiment(
                cfg, run_name=run_name, measure_performance=False
            )
            curve = val_curve(
                os.path.join(args.out, "logs", f"{run_name}.jsonl")
            )
            results[run_name] = {
                "best_miou": float(report.get("best_miou", float("nan"))),
                "curve": curve,
            }
            print(f"  best mIoU: {results[run_name]['best_miou']:.4f}")

    print("\n=== comparison ===")
    summary = {}
    ref_impl = "sort" if "sort" in args.impls else args.impls[-1]
    for mode in args.modes:
        s = results[f"{mode}_{ref_impl}_s{args.seed}"]
        summary[mode] = {f"{ref_impl}_best_miou": s["best_miou"]}
        for impl in args.impls:
            if impl == ref_impl:
                continue
            b = results[f"{mode}_{impl}_s{args.seed}"]
            d = abs(b["best_miou"] - s["best_miou"])
            curve_d = [
                abs(x[1] - y[1]) for x, y in zip(b["curve"], s["curve"])
            ]
            summary[mode][f"{impl}_best_miou"] = b["best_miou"]
            summary[mode][f"{impl}_best_miou_abs_diff"] = d
            summary[mode][f"{impl}_max_curve_abs_diff"] = (
                max(curve_d) if curve_d else None
            )
            print(f"{mode}: {impl} {b['best_miou']:.4f} vs {ref_impl} "
                  f"{s['best_miou']:.4f} (|d| {d:.4f}; max curve |d| "
                  f"{max(curve_d) if curve_d else float('nan'):.4f})")

    with open(os.path.join(args.out, "lovasz_ab.json"), "w") as f:
        json.dump({"summary": summary, "runs": results}, f, indent=2)
    print(f"results -> {os.path.join(args.out, 'lovasz_ab.json')}")


if __name__ == "__main__":
    main()
