"""Quality A/B for ``adversarial.disc_downsample`` (VERDICT r4 #4 tail).

The speed story is measured (PERFORMANCE.md "Discriminator input
downsampling": factor 8 = 1.17x flagship step); this script supplies the
missing QUALITY evidence: does feeding the discriminator softmax maps of
block-mean-pooled logits (factor 8) change the adversarial training
trajectory beyond seed noise vs factor 1 (reference parity)?

Matched-data, matched-schedule flagship runs (adversarial + Lovász through
``run_experiment``, aug off) on the synthetic UDA fixtures, factor 1 vs 8,
one run per factor per seed. Compare best/val mIoU trajectories; judge the
factor delta against the seed-to-seed spread measured the same way.

Factor 8 needs a train side >= 256 px (the pooled map must keep D's
32-pixel minimum side — smaller sizes raise at trace time), so the
default probe size is 256x512; on TPU the 4 runs take ~15 min.

Usage::

    python scripts/ab_disc_downsample.py --device tpu --seeds 0 1

Results: table on stdout + JSON at ``<out>/disc_ds_ab.json``; conclusions
recorded in PERFORMANCE.md.
"""

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def build_cfg(factor, gta, cs, size, batch, epochs, out, seed):
    from rtda_semanticsegmentation_tpu.config import get_preset

    cfg = get_preset("bisenet_adversarial_lovasz")
    return cfg.replace(
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
        adversarial=dataclasses.replace(
            cfg.adversarial, disc_downsample=factor
        ),
        train=dataclasses.replace(
            cfg.train,
            batch_size=batch,
            epochs=epochs,
            seed=seed,
            checkpoint_dir=os.path.join(out, f"ckpt_f{factor}_s{seed}"),
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--device", choices=("cpu", "tpu"), default="cpu")
    p.add_argument("--size", type=int, nargs=2, default=(256, 512))
    p.add_argument("--n_images", type=int, default=16)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--factors", type=int, nargs="+", default=[1, 8])
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    p.add_argument("--out", default="/tmp/ab_disc_ds")
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
    for seed in args.seeds:
        for factor in args.factors:
            run_name = f"f{factor}_s{seed}"
            print(f"=== {run_name} ({args.epochs} epochs) ===", flush=True)
            cfg = build_cfg(factor, gta, cs, args.size, args.batch,
                            args.epochs, args.out, seed)
            report = run_experiment(
                cfg, run_name=run_name, measure_performance=False
            )
            results[run_name] = float(report.get("best_miou", float("nan")))
            print(f"  best mIoU: {results[run_name]:.4f}", flush=True)

    print("\n=== comparison ===")
    for seed in args.seeds:
        base = results[f"f{args.factors[0]}_s{seed}"]
        for factor in args.factors[1:]:
            v = results[f"f{factor}_s{seed}"]
            print(f"seed {seed}: f{args.factors[0]} {base:.4f} vs "
                  f"f{factor} {v:.4f} (d {v - base:+.4f})")
    if len(args.seeds) > 1:
        f0 = [results[f"f{args.factors[0]}_s{s}"] for s in args.seeds]
        print(f"seed spread at f{args.factors[0]}: "
              f"{max(f0) - min(f0):.4f}")
    with open(os.path.join(args.out, "disc_ds_ab.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"results -> {os.path.join(args.out, 'disc_ds_ab.json')}")


if __name__ == "__main__":
    main()
